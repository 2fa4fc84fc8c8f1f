"""Round-12 scaling probes (verdict ask #5): the three families the
registry-level probe (tools/scaling_probe.py) cannot see because they
are streaming or parameterized below the query surface.

  A. polite-stream store growth — start_polite_warc_dedup_stream on a
     host-heavy crawl (every micro-batch introduces NEW hosts), with
     per-batch durations pulled from the StreamingQuery progress log.
     The question: does batch N's wall grow with the size of the
     robots/fingerprint stores accumulated over batches 1..N-1?
  B. resolve_sitemap_tree depth x host product — wall across a
     (hosts, depth) grid on branching sitemapindex trees; alpha in H
     at fixed D must be ~1 and depth must cost plan-levels, not
     data-power.
  C. scan_avro_range on a straddling-sync-heavy fixture — tiny blocks
     and range sizes chosen so EVERY range boundary splits a block;
     sharded==whole row equality plus wall vs n_ranges, and a
     corrupt-heavy variant that exercises the resync recovery path.

    python tools/probe_r12.py            # all three
    python tools/probe_r12.py A|B|C      # one family
"""

from __future__ import annotations

import gzip
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark():
    from corrie_spark.session import get_spark

    spark = get_spark("probe-r12", int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# ---------------------------------------------------------------------------
# A. polite-stream store growth
# ---------------------------------------------------------------------------

ROBOTS = "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"


def _build_host_heavy_crawl(crawl: str, n_files: int, hosts_per_file: int,
                            pages_per_host: int) -> None:
    """Every file introduces hosts_per_file NEW hosts (robots first,
    then pages) — the store-growth worst case: the robots store gains
    hosts_per_file rows per batch, so batch N verdicts against a
    store of N*hosts_per_file hosts."""
    from corrie_spark.sources import warc as Wc

    os.makedirs(crawl, exist_ok=True)
    t0 = int(time.time()) - 100_000
    for g in range(n_files):
        members = [Wc.warcinfo_record(f"grow-{g:05d}.warc.gz")]
        for h in range(hosts_per_file):
            host = f"www.h{g:04d}x{h:03d}.example.com"
            members.append(
                Wc.plain_response_record(
                    f"rob:{g}:{h}", f"https://{host}/robots.txt", ROBOTS
                )
            )
            for p in range(pages_per_host):
                members.append(
                    Wc.plain_response_record(
                        f"pg:{g}:{h}:{p}",
                        f"https://{host}/doc/{p}",
                        f"text {g} {h} {p}",
                    )
                )
        path = os.path.join(crawl, f"grow-{g:05d}.warc.gz")
        with open(path, "wb") as f:
            f.write(b"".join(gzip.compress(m, compresslevel=1) for m in members))
        os.utime(path, (t0 + g, t0 + g))


def probe_a(spark, work: str) -> None:
    from corrie_spark.sources.warc import start_polite_warc_dedup_stream

    n_files, hosts_per_file, pages = 24, 40, 3
    crawl = os.path.join(work, "crawl_a")
    _build_host_heavy_crawl(crawl, n_files, hosts_per_file, pages)
    wdir = os.path.join(work, "work_a")
    t0 = time.perf_counter()
    q = start_polite_warc_dedup_stream(
        spark, crawl, wdir, max_files_per_trigger=1
    )
    q.awaitTermination(600)
    total = time.perf_counter() - t0
    prog = q.recentProgress
    durs = [
        (p["batchId"], p["batchDuration"] / 1000.0)
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    durs.sort()
    print(f"A. polite stream: {n_files} batches x {hosts_per_file} new hosts, "
          f"total {total:.1f}s")
    for bid, d in durs:
        print(f"   batch {bid:3d}  {d:6.2f}s")
    if len(durs) >= 8:
        head = [d for _, d in durs[1:5]]   # skip batch 0 (codegen)
        tail = [d for _, d in durs[-4:]]
        ratio = (sum(tail) / len(tail)) / (sum(head) / len(head))
        print(f"   head mean {sum(head)/4:.2f}s  tail mean {sum(tail)/4:.2f}s  "
              f"tail/head {ratio:.2f} (store grew {len(durs)-4}x..{len(durs)}x "
              f"over the window)")


# ---------------------------------------------------------------------------
# B. sitemap tree depth x host
# ---------------------------------------------------------------------------

def _tree_rows(host: str, depth: int, branch: int, pages: int):
    """One host's sitemap tree: root index -> ... -> depth-1 indexes
    -> leaf urlsets with `pages` locs. Returns (rows, root_url)."""
    rows = []

    def urlset(urls):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return f'<?xml version="1.0"?><urlset>{body}</urlset>'

    def index(urls):
        body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in urls)
        return f'<?xml version="1.0"?><sitemapindex>{body}</sitemapindex>'

    def build(url: str, level: int) -> None:
        if level == depth - 1:
            rows.append(
                (host, url, urlset(
                    [f"https://{host}/p/{url.rsplit('/', 1)[1]}/{i}"
                     for i in range(pages)]
                ))
            )
            return
        kids = [f"https://{host}/sm/{level + 1}-{url.rsplit('/', 1)[1]}-{b}.xml"
                for b in range(branch)]
        rows.append((host, url, index(kids)))
        for k in kids:
            build(k, level + 1)

    root = f"https://{host}/sm/root.xml"
    build(root, 0)
    return rows, root


def probe_b(spark, work: str) -> None:
    from corrie_spark.operators.web import resolve_sitemap_tree

    grid = [(40, 3), (160, 3), (40, 5), (160, 5)]
    branch, pages = 3, 8
    walls: dict[tuple[int, int], tuple[float, int]] = {}
    for hosts, depth in grid + [grid[0]]:  # first cell re-run warm last
        sm_rows, root_rows = [], []
        for h in range(hosts):
            host = f"h{h:04d}.example.com"
            rows, root = _tree_rows(host, depth, branch, pages)
            sm_rows.extend(rows)
            root_rows.append((host, root))
        sitemaps = spark.createDataFrame(
            sm_rows, "host string, url string, sitemap_xml string"
        )
        roots = spark.createDataFrame(root_rows, "host string, url string")
        t0 = time.perf_counter()
        n = resolve_sitemap_tree(sitemaps, roots, max_depth=depth).count()
        walls[(hosts, depth)] = (time.perf_counter() - t0, n)
    print("B. resolve_sitemap_tree (branch=3, pages/leaf=8):")
    for (hosts, depth), (w, n) in walls.items():
        print(f"   hosts={hosts:4d} depth={depth}  {w:6.2f}s  pages={n}")
    for depth in (3, 5):
        t1, tn = walls[(40, depth)][0], walls[(160, depth)][0]
        print(f"   alpha in hosts at depth {depth}: "
              f"{math.log(tn / t1) / math.log(4):.2f}")


# ---------------------------------------------------------------------------
# C. avro sharded scan, straddling-sync-heavy
# ---------------------------------------------------------------------------

def probe_c(spark, work: str) -> None:
    from corrie_spark.sources.avro import encode_ocf, iter_ocf, scan_avro_range

    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    n_rec = 120_000
    recs = [{"id": i, "s": f"value-{i:08d}-" + "x" * (i % 37)} for i in range(n_rec)]
    data = encode_ocf(schema, recs, name="straddle", block_size=50)
    path = os.path.join(work, "straddle.avro")
    with open(path, "wb") as f:
        f.write(data)
    whole = sum(len(rows) for _, rows in iter_ocf(data) if rows is not None)

    print(f"C. scan_avro_range: file {len(data)//1024} KiB, {n_rec} records, "
          f"block_size=50 (~{len(data) // (n_rec // 50)}-byte blocks)")
    base = None
    for range_kib in (512, 128, 32, 8):
        rb = range_kib * 1024
        t0 = time.perf_counter()
        got = 0
        s = 0
        while s < len(data):
            for _, rows in scan_avro_range(path, s, min(rb, len(data) - s)):
                if rows is not None:
                    got += len(rows)
            s += rb
        w = time.perf_counter() - t0
        n_ranges = (len(data) + rb - 1) // rb
        eq = "==" if got == whole else f"!= whole {whole}"
        if base is None:
            base = (n_ranges, w)
        alpha = math.log(w / base[1]) / math.log(n_ranges / base[0]) if n_ranges != base[0] else 0.0
        print(f"   range {range_kib:4d} KiB  ranges={n_ranges:5d}  {w:6.2f}s  "
              f"rows {got} {eq}  alpha_vs_ranges={alpha:.2f}")

    # corrupt-heavy: flip a byte inside every 4th block's payload so the
    # recovery resync path runs hundreds of times per range
    bad = bytearray(data)
    from corrie_spark.sources.avro import read_header
    plan, codec, sync, pos = read_header(data)
    i = 0
    off = pos
    while True:
        nxt = data.find(sync, off + 1)
        if nxt < 0:
            break
        if i % 4 == 0 and nxt - off > 30:
            bad[off + 20] ^= 0xFF
        off = nxt + 16
        i += 1
    bpath = os.path.join(work, "straddle_bad.avro")
    with open(bpath, "wb") as f:
        f.write(bytes(bad))
    for range_kib in (512, 64):
        rb = range_kib * 1024
        t0 = time.perf_counter()
        ok = err = 0
        s = 0
        while s < len(bad):
            for _, rows in scan_avro_range(bpath, s, min(rb, len(bad) - s)):
                if rows is None:
                    err += 1
                else:
                    ok += len(rows)
            s += rb
        w = time.perf_counter() - t0
        print(f"   corrupt-heavy range {range_kib:4d} KiB  {w:6.2f}s  "
              f"rows={ok} error_blocks={err}")


def main() -> int:
    which = sys.argv[1].upper() if len(sys.argv) > 1 else "ABC"
    work = tempfile.mkdtemp(prefix="probe_r12_")
    spark = None
    try:
        if "A" in which or "B" in which:
            spark = _spark()
        if "A" in which:
            probe_a(spark, work)
        if "B" in which:
            probe_b(spark, work)
        if "C" in which:
            probe_c(spark, work)
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        if spark is not None:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
