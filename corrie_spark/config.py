"""Load the REFERENCE'S OWN configuration format and build the
equivalent Spark pipeline.

A corrie deployment is configured by `etc/corrie.yml` plus `CORRIE_*`
environment variables (reference: main.go:19-27 registers the file
loader and an env loader for `^CORRIE_`; etc/corrie.yml is the
shipped template). Migration should not require rewriting that file:
`load_corrie_yml` understands its two conventions —

  - `${NAME}` environment interpolation inside strings (the envconf
    loader's substitution; a missing variable is a hard error, same
    as the reference's required-config panic), and
  - `{_var: "path"}` references to other keys (the iph0/conf
    convention used by `batch: {_var: "batch"}` in the template),

and `pipeline_from_corrie_yml` maps the resolved keys onto the
Spark-side equivalents:

  reader.rabbit.uri        -> amqp_sharded_queue `brokerUrl`
  reader.rabbit.queue      -> `queue` (shard queues `<queue>.0..N-1`,
                              the reference's naming, reader.go:140)
  reader.rabbit.maxShard   -> `shards` = maxShard + 1 (reader.go:139
                              consumes 0..MaxShard inclusive)
  reader.batch             -> `prefetch` = batch * 10 (the reference
                              sets the channel prefetch to 10x the
                              batch, reader.go:96)
  writer.clickhouseURI     -> NativeTcpSink hosts: the URI's own
                              host:port plus every `alt_hosts` entry
                              (round-robin, K12)
  writer.batch             -> WriterConfig.batch_size
  writer.period            -> PipelineConfig.trigger_seconds (B2)
  reader.rabbit.queueFailed-> returned as `failed_queue` for the DLQ
                              naming (K11); the parquet DLQ keeps the
                              raw body exactly like the failed queue
  reader.rabbit.maxRetry   -> NOT mapped to a writer knob: in the
                              reference it bounds the nanachi
                              CLIENT-RECONNECT retrier
                              (reader.go:64-82), which Spark covers
                              with checkpointed redelivery; exposed
                              in the loaded dict for operators.

healthcheck.listen's port pairs with streaming/health_http.py, which
serves the same /healthcheck + /status endpoints (K14).
"""

from __future__ import annotations

import os
import re
from typing import Any
from urllib.parse import parse_qs, urlparse

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _interp_env(node: Any, env: dict) -> Any:
    """Pass 1: substitute ${NAME} in every string; full-integer
    results become ints (YAML quoted them only to allow the
    substitution syntax)."""
    if isinstance(node, dict):
        return {k: _interp_env(v, env) for k, v in node.items()}
    if isinstance(node, list):
        return [_interp_env(v, env) for v in node]
    if isinstance(node, str):
        def sub(m: re.Match) -> str:
            name = m.group(1)
            if name not in env:
                raise KeyError(
                    f"environment variable {name} is not set "
                    "(required by corrie.yml)"
                )
            return str(env[name])

        out = _ENV_RE.sub(sub, node)
        if out != node and re.fullmatch(r"-?\d+", out):
            return int(out)
        return out
    return node


def _lookup(root: dict, path: str) -> Any:
    cur: Any = root
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise KeyError(f"_var reference {path!r} not found in config")
        cur = cur[part]
    return cur


def _resolve_vars(node: Any, root: dict) -> Any:
    """Pass 2: replace {_var: "dotted.path"} nodes with the value at
    that path in the (already env-interpolated) tree."""
    if isinstance(node, dict):
        if set(node) == {"_var"}:
            return _resolve_vars(_lookup(root, node["_var"]), root)
        return {k: _resolve_vars(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_vars(v, root) for v in node]
    return node


def load_corrie_yml(path: str, env: dict | None = None) -> dict:
    """Parse + fully resolve a reference corrie.yml. `env` defaults to
    os.environ; pass a dict in tests."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    tree = _interp_env(raw, dict(os.environ) if env is None else env)
    return _resolve_vars(tree, tree)


def reader_options(cfg: dict, state_dir: str) -> dict:
    """amqp_sharded_queue options from the resolved reader block."""
    rabbit = cfg["reader"]["rabbit"]
    return {
        "brokerUrl": rabbit["uri"],
        "queue": rabbit.get("queue", "corrie"),
        "shards": str(int(rabbit.get("maxShard", 0)) + 1),
        "prefetch": str(int(cfg["reader"].get("batch", 1000)) * 10),
        "stateDir": state_dir,
    }


def sink_options(cfg: dict) -> dict:
    """sink_from_options dict from writer.clickhouseURI: primary
    host:port plus alt_hosts, in declaration order."""
    uri = cfg["writer"]["clickhouseURI"]
    u = urlparse(uri)
    hosts = [u.netloc.rsplit("@", 1)[-1]]  # strip user:pass if present
    for alts in parse_qs(u.query).get("alt_hosts", []):
        hosts += [h.strip() for h in alts.split(",") if h.strip()]
    return {"nativeHosts": ",".join(hosts)}


def pipeline_from_corrie_yml(
    spark,
    path: str,
    registry,
    *,
    checkpoint_dir: str,
    state_dir: str,
    dlq=None,
    sink=None,
    env: dict | None = None,
    available_now: bool = False,
    reader_option_overrides: dict | None = None,
):
    """The migration entry point: point it at an existing corrie.yml
    (+ its CORRIE_* environment) and get the running Spark pipeline —
    AMQP sharded consume in, micro-batch typed writes over native TCP
    out, DLQ for poison, the reference's trigger cadence. `sink`/`dlq`
    override the config-derived endpoints (tests use the in-process
    stand-ins); `reader_option_overrides` lets tests point the source
    at the file-backed broker instead of a live `brokerUrl`."""
    from corrie_spark.sinks.base import DLQSink, sink_from_options
    from corrie_spark.sinks.writer import WriterConfig
    from corrie_spark.sources.amqp import register_amqp_sharded_queue
    from corrie_spark.streaming.pipeline import PipelineConfig, start_pipeline

    cfg = load_corrie_yml(path, env=env)
    opts = reader_options(cfg, state_dir)
    if reader_option_overrides:
        opts.update(reader_option_overrides)
        if "broker" in reader_option_overrides:
            opts.pop("brokerUrl", None)
    register_amqp_sharded_queue(spark)
    src = spark.readStream.format("amqp_sharded_queue").options(**opts).load()

    failed_queue = cfg["reader"]["rabbit"].get("queueFailed", "failed")
    if dlq is None:
        dlq = DLQSink(os.path.join(state_dir, f"_dlq_{failed_queue}"))
    if sink is None:
        sink = sink_from_options(sink_options(cfg))

    pc = PipelineConfig(
        checkpoint_dir=checkpoint_dir,
        trigger_seconds=int(cfg["writer"].get("period", 60)),
        available_now=available_now,
        writer=WriterConfig(batch_size=int(cfg["writer"].get("batch", 1000))),
    )
    return start_pipeline(src, sink, dlq, registry, pc)
