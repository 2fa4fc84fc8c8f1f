"""Chat-template rendering + assistant loss-mask spans (SFT prep).

Instruction-tuning pipelines render conversations — arrays of
(role, content) messages — into one training string under a template,
and need the CHARACTER SPANS of the assistant contents so the loss
mask can zero everything else. Both are pure Column expressions (one
F.aggregate fold, JVM-side, no Python), so at 100 TB this stage is a
free rider on the corpus scan like operators/web.py.

Template (the ChatML-like public shape):
    <|role|>\n{content}<|end|>\n        per message, concatenated.

Spans are 0-based [start, end) character offsets into the rendered
string, one per assistant message, in order. Offsets are CHARACTERS
(Spark `length` semantics) — a tokenizer-space mask is derived
downstream after tokenization, where the token boundaries exist.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TERMINATOR = "<|end|>\n"

_ACC_SCHEMA = "struct<s:string,spans:array<struct<start:bigint,end:bigint>>>"


def chat_fold(messages: Column | str) -> Column:
    """messages array<struct<role,content>> -> struct(s, spans): the
    rendered string and the assistant-content spans, in ONE aggregate
    fold (acc referenced per element, never re-evaluating the array)."""
    msgs = F.col(messages) if isinstance(messages, str) else messages
    init = F.struct(
        F.lit("").alias("s"),
        F.expr(
            "cast(array() as array<struct<start:bigint,end:bigint>>)"
        ).alias("spans"),
    )

    def step(acc, m):
        pre = F.concat(
            acc["s"], F.lit("<|"), m["role"], F.lit("|>\n")
        )
        start = F.length(pre).cast("long")
        s2 = F.concat(pre, m["content"], F.lit(TERMINATOR))
        span = F.struct(
            start.alias("start"),
            (start + F.length(m["content"])).cast("long").alias("end"),
        )
        spans2 = F.when(
            m["role"] == "assistant",
            F.array_append(acc["spans"], span),
        ).otherwise(acc["spans"])
        return F.struct(s2.alias("s"), spans2.alias("spans"))

    return F.aggregate(msgs, init, step)


def render_chat(messages: Column | str) -> Column:
    """Rendered training string."""
    return chat_fold(messages)["s"]


def assistant_spans(messages: Column | str) -> Column:
    """array<struct<start,end>> of assistant content spans (0-based,
    end-exclusive, character offsets)."""
    return chat_fold(messages)["spans"]


FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"


def fim_transform(
    text: Column | str,
    lo: Column,
    hi: Column,
) -> Column:
    """Fill-in-the-middle transformation (the PSM layout code models
    train on): split `text` at character positions [lo, hi) into
    prefix / middle / suffix and render
        <|fim_prefix|>{prefix}<|fim_suffix|>{suffix}<|fim_middle|>{middle}
    so the model learns to produce the middle conditioned on both
    sides. Split points are CALLER-SUPPLIED integer columns (exact-int
    arithmetic survives cross-engine comparison; a fraction would ride
    IEEE rounding) — determinism is the caller's policy: a hash-derived
    position in the gated query, a seeded random in a training job.
    Pure Column expressions, row-local."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.length(t)
    lo_i = lo.cast("int")
    hi_i = hi.cast("int")
    prefix = F.substring(t, F.lit(1), lo_i)
    middle = F.substring(t, lo_i + 1, hi_i - lo_i)
    suffix = F.substring(t, hi_i + 1, n.cast("int") - hi_i)
    return F.concat(
        F.lit(FIM_PRE), prefix,
        F.lit(FIM_SUF), suffix,
        F.lit(FIM_MID), middle,
    )


def spans_fingerprint(spans: Column) -> Column:
    """Deterministic 'start:end|start:end' string of a spans array —
    the compare/join-friendly form the gated queries hash."""
    return F.array_join(
        F.transform(
            spans,
            lambda sp: F.concat_ws(
                ":", sp["start"].cast("string"), sp["end"].cast("string")
            ),
        ),
        "|",
    )
