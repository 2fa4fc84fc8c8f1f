"""Driver simulator: replicate the external driver's correctness gate.

Runs every `__spark_entry__.queries()` entry on a VANILLA SparkSession
(no corrie_spark.session confs — ANSI on, machine tz) at sf0.01 and
compares against `oracle_sql()` run in DuckDB over the same parquet:
row count, name-sorted schema, and exact (no tolerance) value equality
after canonicalization (Decimal->float, datetime->isoformat, rows
sorted None-safely by repr).

This mirrors the judge's round-1 verification harness; run it as the
last act of every round:

    python tools/driver_sim.py            # sf0.01, writes CORRECTNESS_local.json
    python tools/driver_sim.py /root/testdata/sf0.001
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "customer",
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
]


def norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)  # None-safe (mixed None/values in a column)
    return [c.lower() for c in sorted(cols, key=str.lower)], out


# Spark simpleString -> acceptable DuckDB/Arrow type strings.  The real
# driver hashes Arrow-level values, so a DuckDB HUGEINT (decimal128) or
# INT32 column against a Spark BIGINT hashes differently even when the
# values are numerically equal — catch that here, not in the driver run.
_TYPE_COMPAT = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double", "float64"},
    "float": {"float", "float32"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32", "date32[day]"},
}


def type_flags(sdf, arrow_schema):
    """Per-column [spark_type, oracle_arrow_type] pairs that would hash
    differently at the driver, plus any oracle type outside the safe set."""
    stypes = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
    flags = {}
    for field in arrow_schema:
        at = str(field.type)
        st = stypes.get(field.name.lower())
        if st is None:
            continue
        if st.startswith("timestamp") and at.startswith("timestamp"):
            continue
        ok = _TYPE_COMPAT.get(st)
        if ok is None or at not in ok:
            flags[field.name.lower()] = [st, at]
        # int32 on BOTH sides hashes green today but is one DuckDB
        # promotion away from red; flag non-{int64,double,string,bool,
        # ts,date} oracle output types as a warning either way.
        elif at in ("int32", "float", "float32"):
            flags[field.name.lower()] = [st, at + " (narrow)"]
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                rec["err"] = "NO_ORACLE"
                rec["spark_rows"] = len(srows)
                results[name] = rec
                continue
            # ONE execution per oracle: the arrow table carries both the
            # schema (for the type check) and the rows — re-running the
            # SQL for fetchall() doubled oracle time on the recursive-
            # closure / k-means-replay queries
            otab = con.execute(osql[name]).arrow()
            ocols = otab.schema.names
            ocols_py = [otab.column(i).to_pylist() for i in range(otab.num_columns)]
            orows = [tuple(vals) for vals in zip(*ocols_py)] if ocols_py else []
            tf = type_flags(sdf, otab.schema)
            if tf:
                rec["type_flags"] = tf
            sc, sr = canon(scols, srows)
            oc, orr = canon(ocols, orows)
            rec["rows_match"] = len(sr) == len(orr)
            rec["schema_match"] = sc == oc
            rec["hash_match"] = sr == orr
            rec["spark_rows"] = len(sr)
            rec["oracle_rows"] = len(orr)
            if not rec["hash_match"] and rec["rows_match"]:
                diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
                rec["first_diffs"] = [
                    [list(map(repr, a)), list(map(repr, b))] for a, b in diffs
                ]
        except Exception as e:  # noqa: BLE001 — record, keep going
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        ok = rec["err"] is None and rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        tag = "ok " if ok else "BAD"
        if ok and rec.get("type_flags"):
            tag = "TYP"  # values equal, but Arrow types differ -> driver red
        print(f"{tag} {name}" + (f" {rec.get('type_flags')}" if rec.get("type_flags") else ""), flush=True)

    out = os.path.join(REPO, "CORRECTNESS_local.json")
    if only:
        # a filtered run must not clobber the full-registry record —
        # merge the re-checked entries into the existing file
        try:
            with open(out) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
        merged.update(results)
        if len(merged) > len(results):
            results_to_write = merged
        else:
            results_to_write = results
    else:
        results_to_write = results
    with open(out, "w") as f:
        json.dump(results_to_write, f, indent=1, default=str)
    bad = {
        k: v
        for k, v in results.items()
        if v["err"] or not (v["rows_match"] and v["schema_match"] and v["hash_match"])
    }
    typed = {k: v["type_flags"] for k, v in results.items() if v.get("type_flags") and k not in bad}
    print(f"TOTAL {len(results)} BAD {len(bad)} TYPE-FLAGGED {len(typed)}")
    if bad:
        print(json.dumps(bad, indent=1, default=str))
    if typed:
        print("type flags (driver-red risk):", json.dumps(typed, default=str))
    return 1 if (bad or typed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
