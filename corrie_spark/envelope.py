"""Message envelope: parse, validate, coerce, route (SURVEY §2.2).

The reference's unit of data is a JSON envelope
``{"Query": "INSERT INTO db.tbl (...) VALUES (?,...)", "Data": [...]}``
(reference message/message.go:8-11). This module re-expresses the
decode stage as pure DataFrame transformations:

  M1 JSON decode          (writer/writer.go:113-115)  -> parse_envelopes
  M2 poison-message split (writer/writer.go:115-125)  -> split_dlq
  M3 numeric coercion     (writer/writer.go:250-277)  -> coerce_numeric
  M4 group-by-query route (writer/writer.go:127-138)  -> table_name / groupBy

Everything is expression-level (JVM-side, whole-stage codegen); no
Python UDFs. The `Data` array is parsed as ARRAY<STRING> so numerics
survive as exact decimal strings until coercion — the Spark analog of
jsoniter's UseNumber (message/message.go:5). One deviation: Jackson
canonicalizes float literals ("1.50" -> "1.5", exact int literals of
any size are preserved verbatim), which keeps the two properties the
coercion chain depends on (int-ness and numeric value) while dropping
trailing-zero formatting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# Envelope schema: field names are the reference's public API.
MESSAGE_SCHEMA = StructType(
    [
        StructField("Query", StringType(), nullable=True),
        StructField("Data", ArrayType(StringType()), nullable=True),
    ]
)

PARSE_ERROR = "parse_error"
PREPARE_FAILED = "prepare_failed"
EXEC_FAILED = "exec_failed"


def parse_envelopes(df: DataFrame, body_col: str = "body") -> DataFrame:
    """M1: decode raw JSON bodies into (query, data) + parse_ok flag.

    FAILFAST is wrong here — the contract (writer.go:115-125) is that a
    poison message must not crash or stall the pipeline, so we parse
    permissively and flag. `from_json` yields null struct/fields on
    malformed input; an envelope is OK iff both fields materialize.
    """
    parsed = F.from_json(F.col(body_col), MESSAGE_SCHEMA)
    return (
        df.withColumn("query", parsed["Query"])
        .withColumn("data", parsed["Data"])
        .withColumn(
            "parse_ok", parsed["Query"].isNotNull() & parsed["Data"].isNotNull()
        )
    )


def split_dlq(df: DataFrame, body_col: str = "body") -> tuple[DataFrame, DataFrame]:
    """M2: split parsed stream into (ok, dead-letter).

    DLQ rows carry the RAW original body unchanged plus a reason —
    the reference forwards the untouched body to the `failed` queue
    (reader/reader.go:167-179, FIXTURES.md F4).
    """
    ok = df.filter(F.col("parse_ok")).drop("parse_ok")
    dlq = df.filter(~F.col("parse_ok")).select(
        F.col(body_col).alias("raw_body"), F.lit(PARSE_ERROR).alias("reason")
    )
    return ok, dlq


def coerce_numeric(c: Column) -> Column:
    """M3: int64-first, float64-fallback coercion of a decimal string.

    Mirrors makeCHArray (writer.go:250-277): json.Number -> Int64()
    first, Float64() fallback, else raw string. Returned as a struct
    (i, f, s) with exactly one non-null branch so downstream binding
    can pick the typed slot without re-parsing.

    Go's ParseInt accepts only an optionally-signed digit string (so
    "1.0" falls to float); the regex guard pins that exactly, and
    try_cast turns int64 overflow into the float fallback the same way
    ParseInt's ErrRange does.
    """
    as_long = F.when(c.rlike(r"^[+-]?[0-9]+$"), c.try_cast("bigint"))
    as_double = c.try_cast("double")
    return F.struct(
        as_long.alias("i"),
        F.when(as_long.isNull(), as_double).alias("f"),
        F.when(as_long.isNull() & as_double.isNull(), c).alias("s"),
    )


def coerce_numeric_double(c: Column) -> Column:
    """M3 collapsed to a single numeric column (long-exact values kept
    exact through the long branch, then widened): the common case when
    the target column is numeric."""
    as_long = F.when(c.rlike(r"^[+-]?[0-9]+$"), c.try_cast("bigint"))
    return F.coalesce(as_long.cast("double"), c.try_cast("double"))


def table_name(query_col: Column | str) -> Column:
    """M4 routing key: extract `db.tbl` from the INSERT statement.

    The reference routes on the whole SQL string (writer.go:127-138)
    and splits the prefix at VALUES (clickhouse.go:27-29); the table
    identity is the stable routing key for partitioned sinks.
    """
    c = F.col(query_col) if isinstance(query_col, str) else query_col
    return F.regexp_extract(c, r"(?i)insert\s+into\s+([A-Za-z0-9_.]+)", 1)


def insert_prefix(query_col: Column | str) -> Column:
    """K1: the INSERT prefix before VALUES — what the reference sends
    to the server at prepare time (clickhouse.go:27-29, 76-87)."""
    c = F.col(query_col) if isinstance(query_col, str) else query_col
    return F.regexp_extract(c, r"(?is)^(.*?)\s+values\s*\(", 1)


def bind_positional(df: DataFrame, columns: list[tuple[str, str]], data_col: str = "data") -> DataFrame:
    """Bind the positional `data` array to named typed columns.

    `columns` is [(name, spark_type_ddl), ...] in VALUES order — the
    Spark analog of the driver building a typed block from the
    server's metadata block (clickhouse_read_meta.go:10-48,
    block.go:95-125). Uses try_cast: a value that cannot coerce
    becomes NULL (caller decides exec_failed routing, K7).
    """
    sel = list(df.columns)
    for i, (name, ddl) in enumerate(columns):
        sel.append(F.element_at(F.col(data_col), i + 1).try_cast(ddl).alias(name))
    return df.select(*sel)


def encode_envelope(query: Column | str, data_cols: list[Column]) -> Column:
    """Produce an envelope JSON string (producer side; message.go:14-16).
    All values are stringified — UseNumber symmetry with the parser."""
    q = F.lit(query) if isinstance(query, str) else query
    return F.to_json(
        F.struct(
            q.alias("Query"),
            F.array(*[c.cast("string") for c in data_cols]).alias("Data"),
        )
    )
