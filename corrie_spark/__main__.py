"""CLI: `python -m corrie_spark <command>`.

Commands:
  list                      list registered queries (* = has oracle)
  run <name> [--sf-dir D]   run one query, print rows (truncated)
  bench [--sf-dir D]        run the benchmark (same as bench.py)
  pipeline --spool P --out O --checkpoint C [--drain]
                            start the streaming ETL over a sharded
                            spool dir (demo wiring: parquet sink +
                            DLQ + commit log)
  explain <name> [--sf-dir D]  print the optimized + physical plan
                            of one registered query (the plan-shape
                            review surface PLANS.md sweeps)
  index --sf-dir D --out O [--ivf]
                            train and persist the PQ (optionally
                            +IVF) ANN index as parquet tables
  build --sf-dir D --out O [--shard-budget N] [--staged]
                            run the full training-corpus build
                            (dedup -> quality -> strip -> split ->
                            shards) and print the manifest JSON;
                            --staged checkpoints stage tables and
                            resumes completed stages on rerun
  ingest-warc <glob> --out O [--wet] [--html] [--sharded] [--cdx C]
  ingest-pdf <glob> --out O [--errors E]
  ingest-office <glob> --out O [--errors E]
                            ingest crawl files (WARC responses or
                            --wet conversion records), PDFs, or
                            Office/EPUB containers into a documents
                            parquet table, optionally stripping HTML
                            — the front door for `build` over a real
                            crawl
  wds <docs-parquet> --out O [--shards N] [--gz]
  wds <shard-glob> --out O --extract
                            pack a documents table into WebDataset
                            .tar shards (deterministic, manifested) /
                            extract shards back into documents
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="corrie_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)

    bench = sub.add_parser("bench", help="run the benchmark")
    bench.add_argument("--sf-dir", default=None)

    pipe = sub.add_parser("pipeline", help="start the streaming ETL")
    pipe.add_argument("--spool", required=True)
    pipe.add_argument("--out", required=True)
    pipe.add_argument("--checkpoint", required=True)
    pipe.add_argument("--drain", action="store_true", help="availableNow then exit")
    pipe.add_argument("--trigger-seconds", type=int, default=60)
    pipe.add_argument(
        "--native-hosts",
        default=None,
        help="write via native TCP to these host:port pairs (comma-"
        "separated alt_hosts round-robin) instead of the parquet sink",
    )

    exp = sub.add_parser("explain", help="print a query's plans")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    idx = sub.add_parser("index", help="train + persist the ANN index")
    idx.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    idx.add_argument("--out", required=True)
    idx.add_argument("--ivf", action="store_true",
                     help="also persist the IVF inverted file + centroids")

    build = sub.add_parser("build", help="run the training-corpus build")
    build.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    build.add_argument("--out", required=True)
    build.add_argument("--shard-budget", type=int, default=None)
    build.add_argument("--staged", action="store_true",
                       help="checkpoint stage tables; reruns resume")

    ing = sub.add_parser(
        "ingest-warc", help="ingest WARC/WET crawl files into a documents table"
    )
    ing.add_argument("path", help="glob of *.warc.gz / *.warc.wet.gz files")
    ing.add_argument("--out", required=True, help="documents parquet dir")
    ing.add_argument(
        "--wet", action="store_true",
        help="read WET conversion records instead of HTTP responses",
    )
    ing.add_argument(
        "--html", action="store_true",
        help="strip HTML from the extracted text (operators/web.py)",
    )
    ing.add_argument(
        "--sharded", action="store_true",
        help="offset-sharded range reader (multi-GiB files parallelize "
        "past the one-file-one-task ceiling)",
    )
    ing.add_argument(
        "--cdx", default=None,
        help="also write a CDX capture index parquet to this dir",
    )

    pdf = sub.add_parser(
        "ingest-pdf", help="extract text from PDF files into a documents table"
    )
    pdf.add_argument("path", help="glob of *.pdf files")
    pdf.add_argument("--out", required=True, help="documents parquet dir")
    pdf.add_argument(
        "--errors", default=None,
        help="also write the DLQ (unparseable files) parquet to this dir",
    )

    off = sub.add_parser(
        "ingest-office",
        help="extract text from docx/pptx/xlsx/epub into a documents table",
    )
    off.add_argument("path", help="glob of office/epub container files")
    off.add_argument("--out", required=True, help="documents parquet dir")
    off.add_argument(
        "--errors", default=None,
        help="also write the DLQ (unparseable files) parquet to this dir",
    )

    wik = sub.add_parser(
        "ingest-wiki",
        help="ingest MediaWiki multistream .xml.bz2 dumps into a "
        "documents table (wikitext stripped)",
    )
    wik.add_argument("path", help="glob of *-multistream*.xml.bz2 dumps")
    wik.add_argument("--out", required=True, help="documents parquet dir")
    wik.add_argument(
        "--redirects", default=None,
        help="also write the redirect map (page_id, title, target) here",
    )
    wik.add_argument(
        "--keep-ns", type=int, default=0,
        help="namespace to keep (0 = articles, the default)",
    )

    av = sub.add_parser(
        "ingest-avro",
        help="ingest Avro object container files into a parquet table "
        "(schema derived from the files' own avro.schema header)",
    )
    av.add_argument("path", help="glob of *.avro files")
    av.add_argument("--out", required=True, help="output parquet dir")
    av.add_argument(
        "--sharded", action="store_true",
        help="offset-sharded range reader (multi-GiB files parallelize "
        "past the one-file-one-task ceiling; sync-marker resync)",
    )
    av.add_argument(
        "--errors", default=None,
        help="also write the DLQ (corrupt block spans) parquet to this dir",
    )

    wds = sub.add_parser(
        "wds",
        help="WebDataset shards: pack a documents table into .tar shards, "
        "or extract shards back into a documents table",
    )
    wds.add_argument("path", help="documents parquet dir (pack) / shard glob (extract)")
    wds.add_argument("--out", required=True, help="output dir")
    wds.add_argument("--extract", action="store_true",
                     help="read shards -> documents instead of packing")
    wds.add_argument("--shards", type=int, default=8, help="shard count (pack)")
    wds.add_argument("--gz", action="store_true", help="gzip shards (pack)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list":
        from corrie_spark.queries.registry import all_oracles, all_queries

        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{'*' if name in oracles else ' '} {name}")
        return 0

    if args.cmd == "run":
        from corrie_spark.queries.registry import all_queries
        from corrie_spark.session import get_spark

        qs = all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; try: python -m corrie_spark list",
                  file=sys.stderr)
            return 2
        spark = get_spark("corrie-spark-cli")
        spark.sparkContext.setLogLevel("ERROR")
        qs[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    if args.cmd == "bench":
        import os

        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        bench.main()
        return 0

    if args.cmd == "pipeline":
        from corrie_spark.session import get_spark
        from corrie_spark.sinks import DLQSink, SchemaRegistry
        from corrie_spark.sources.sharded_queue import register_sharded_queue
        from corrie_spark.streaming import PipelineConfig, start_pipeline

        spark = get_spark("corrie-spark-pipeline")
        spark.sparkContext.setLogLevel("WARN")
        register_sharded_queue(spark)
        src = (
            spark.readStream.format("sharded_queue")
            .option("path", args.spool)
            .load()
        )
        # demo registry: real deployments construct this from their
        # table DDLs (SchemaRegistry.register per table)
        registry = SchemaRegistry()
        from corrie_spark.sinks.base import sink_from_options

        sink = sink_from_options(
            {"nativeHosts": args.native_hosts}
            if args.native_hosts
            else {"parquetDir": args.out}
        )
        q = start_pipeline(
            src,
            sink,
            DLQSink(f"{args.out}/_dlq"),
            registry,
            PipelineConfig(
                checkpoint_dir=args.checkpoint,
                commit_log_dir=f"{args.checkpoint}/_commits",
                trigger_seconds=args.trigger_seconds,
                available_now=args.drain,
            ),
        )
        q.awaitTermination()
        return 0

    if args.cmd == "explain":
        from corrie_spark.queries.registry import all_queries
        from corrie_spark.session import get_spark

        qs = all_queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; try: python -m corrie_spark list",
                  file=sys.stderr)
            return 2
        spark = get_spark("corrie-spark-explain")
        spark.sparkContext.setLogLevel("ERROR")
        qs[args.name](spark, args.sf_dir).explain(mode="formatted")
        return 0

    if args.cmd == "index":
        import json

        from corrie_spark.operators import pq
        from corrie_spark.operators.index_store import save_ivf_index, save_pq_index
        from corrie_spark.operators.similarity import ivf_centroids, kmeans_cells
        from corrie_spark.session import get_spark
        from corrie_spark.tables import load

        spark = get_spark("corrie-spark-index")
        spark.sparkContext.setLogLevel("ERROR")
        emb = load(spark, args.sf_dir, "embeddings")
        books = pq.pq_codebooks(emb)
        codes = pq.pq_encode(emb, books)
        save_pq_index(spark, args.out, books, codes)
        report = {"pq_books": sum(len(b) for b in books),
                  "pq_codes": codes.count()}
        if args.ivf:
            cells = kmeans_cells(emb, n_cells=8, n_iters=2)
            save_ivf_index(args.out, cells,
                           centroids=ivf_centroids(emb, "label", "embedding", 64))
            report["ivf_cells"] = cells.count()
        print(json.dumps(report, sort_keys=True))
        return 0

    if args.cmd == "build":
        import json

        from corrie_spark.corpus import (
            SHARD_BUDGET_TOKENS,
            build_corpus,
            build_corpus_staged,
        )
        from corrie_spark.session import get_spark
        from corrie_spark.tables import load

        spark = get_spark("corrie-spark-build")
        spark.sparkContext.setLogLevel("ERROR")
        builder = build_corpus_staged if args.staged else build_corpus
        manifest = builder(
            spark,
            load(spark, args.sf_dir, "documents"),
            args.out,
            shard_budget=args.shard_budget or SHARD_BUDGET_TOKENS,
        )
        print(json.dumps(manifest, sort_keys=True))
        return 0

    if args.cmd == "ingest-warc":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.session import get_spark
        from corrie_spark.sources import warc as W

        spark = get_spark("corrie-spark-ingest")
        spark.sparkContext.setLogLevel("ERROR")
        reader = W.read_warc_sharded if args.sharded else W.read_warc
        recs = reader(spark, args.path)
        if args.cdx:
            W.cdx_index(recs).write.mode("overwrite").parquet(args.cdx)
        docs = (W.wet_to_documents if args.wet else W.to_documents)(recs)
        if args.html:
            from corrie_spark.operators.web import html_to_text

            docs = docs.withColumn("text", html_to_text(F.col("text")))
        docs.write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)
        summary = {
            "documents": out.count(),
            "distinct_texts": out.select(F.md5("text")).distinct().count(),
            "out": args.out,
        }
        if args.cdx:
            summary["cdx_rows"] = spark.read.parquet(args.cdx).count()
            summary["cdx"] = args.cdx
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "ingest-pdf":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.session import get_spark
        from corrie_spark.sources import pdf as P

        spark = get_spark("corrie-spark-ingest")
        spark.sparkContext.setLogLevel("ERROR")
        recs = P.read_pdf(spark, args.path)
        if args.errors:
            recs.where(F.col("error").isNotNull()).drop("text").write.mode(
                "overwrite"
            ).parquet(args.errors)
        P.pdf_to_documents(recs).write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)
        summary = {
            "documents": out.count(),
            "distinct_texts": out.select(F.md5("text")).distinct().count(),
            "out": args.out,
        }
        if args.errors:
            summary["errors"] = spark.read.parquet(args.errors).count()
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "ingest-office":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.operators.web import html_to_text
        from corrie_spark.session import get_spark
        from corrie_spark.sources import ooxml as O

        spark = get_spark("corrie-spark-ingest")
        spark.sparkContext.setLogLevel("ERROR")
        recs = O.read_office(spark, args.path)
        if args.errors:
            recs.where(F.col("error").isNotNull()).drop("text").write.mode(
                "overwrite"
            ).parquet(args.errors)
        # epub chapters carry raw xhtml: strip through the crawl chain
        stripped = recs.withColumn(
            "text",
            F.when(
                F.col("kind") == "epub-xhtml", html_to_text(F.col("text"))
            ).otherwise(F.col("text")),
        )
        O.office_to_documents(stripped).write.mode("overwrite").parquet(
            args.out
        )
        out = spark.read.parquet(args.out)
        summary = {
            "documents": out.count(),
            "distinct_texts": out.select(F.md5("text")).distinct().count(),
            "out": args.out,
        }
        if args.errors:
            summary["errors"] = spark.read.parquet(args.errors).count()
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "ingest-wiki":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.session import get_spark
        from corrie_spark.sources import wikipedia as Wk

        spark = get_spark("corrie-spark-ingest")
        spark.sparkContext.setLogLevel("ERROR")
        files = spark.read.format("binaryFile").load(args.path).select(
            "path", "content"
        )
        pages = Wk.wiki_pages(files).where(F.col("ns") == args.keep_ns)
        if args.redirects:
            pages.where(F.col("is_redirect")).select(
                "page_id", "title", "redirect_target"
            ).write.mode("overwrite").parquet(args.redirects)
        arts = pages.where(~F.col("is_redirect"))
        arts.select(
            F.col("page_id").alias("doc_id"),
            "title",
            Wk.wikitext_to_text(F.col("wikitext")).alias("text"),
        ).write.mode("overwrite").parquet(args.out)
        out = spark.read.parquet(args.out)
        summary = {"documents": out.count(), "out": args.out}
        if args.redirects:
            summary["redirects"] = spark.read.parquet(args.redirects).count()
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "ingest-avro":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.session import get_spark
        from corrie_spark.sources import avro as A

        spark = get_spark("corrie-spark-ingest")
        spark.sparkContext.setLogLevel("ERROR")
        rows = A.read_avro(spark, args.path, sharded=args.sharded)
        if args.errors:
            rows.where(F.col("_error")).select(
                "_path", "_block_offset"
            ).write.mode("overwrite").parquet(args.errors)
        rows.where(~F.col("_error")).drop("_error").write.mode(
            "overwrite"
        ).parquet(args.out)
        out = spark.read.parquet(args.out)
        summary = {"rows": out.count(), "out": args.out}
        if args.errors:
            summary["errors"] = spark.read.parquet(args.errors).count()
        print(json.dumps(summary, sort_keys=True))
        return 0

    if args.cmd == "wds":
        import json

        from pyspark.sql import functions as F

        from corrie_spark.session import get_spark
        from corrie_spark.sources import tar_wds as T

        spark = get_spark("corrie-spark-wds")
        spark.sparkContext.setLogLevel("ERROR")
        if args.extract:
            docs = T.wds_to_documents(T.read_wds(spark, args.path))
            docs.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
            print(json.dumps({"documents": out.count(), "out": args.out},
                             sort_keys=True))
            return 0
        docs = spark.read.parquet(args.path)
        man = T.documents_to_wds(docs, args.out, n_shards=args.shards,
                                 gz=args.gz)
        rows = man.collect()
        print(json.dumps(
            {
                "shards": len(rows),
                "samples": sum(r.n_samples for r in rows),
                "bytes": sum(r.n_bytes for r in rows),
                "out": args.out,
            },
            sort_keys=True,
        ))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
