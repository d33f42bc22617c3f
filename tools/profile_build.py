"""Profile the index build's per-phase wall at one parallelism level.

Mirrors bench.py's scaling level exactly (pre-generated pages, shuffle
layout, 64-shard index, n_groups=4) and prints the build_metrics phase
table — the tool that located the build's serial costs (round 4).

Usage: python tools/profile_build.py --cpus 8 [--docs 300000] [--vocab 100000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=300000)
    ap.add_argument("--vocab", type=int, default=100000)
    ap.add_argument("--pages-dir", default=None)
    ap.add_argument("--layout", default="shuffle")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--warm-docs", type=int, default=0,
                    help="run a warm-up build over this many docs first")
    args = ap.parse_args()

    os.environ.setdefault("SIMILARIPY_BUILD_METRICS_STDERR", "1")
    from bench import _mk_spark, _pregen_pages

    from similaripy_spark.fulltext.index_build import IndexBuilder

    pages_dir = args.pages_dir
    own_pages = pages_dir is None
    if own_pages:
        pages_dir = tempfile.mkdtemp(prefix="prof_pages_")
        _pregen_pages(os.cpu_count() or 8, args.docs, args.vocab, pages_dir)

    spark = _mk_spark(args.cpus)
    try:
        pages = spark.read.parquet(pages_dir).persist()
        pages.count()
        shard_size = max(args.docs // 64, 512)
        if args.warm_docs:
            from pyspark.sql import functions as F

            t0 = time.monotonic()
            with tempfile.TemporaryDirectory() as d:
                IndexBuilder(
                    os.path.join(d, "warm"),
                    shard_size=max(args.warm_docs // 8, 512),
                    n_groups=4, input_layout=args.layout,
                ).build(pages.filter(F.col("doc_id") < args.warm_docs))
            print(json.dumps({
                "warmup_sec": round(time.monotonic() - t0, 2),
                "warm_docs": args.warm_docs,
            }), flush=True)

        def jif():
            with open("/proc/stat") as f:
                v = f.readline().split()
            # busy = total - idle - iowait
            n = [int(x) for x in v[1:9]]
            return sum(n) - n[3] - n[4], sum(n)

        for r in range(args.repeats):
            with tempfile.TemporaryDirectory() as d:
                idx = os.path.join(d, "idx")
                b0, t0j = jif()
                t0 = time.monotonic()
                b = IndexBuilder(
                    idx, shard_size=shard_size, n_groups=4,
                    input_layout=args.layout,
                )
                b.build(pages)
                wall = time.monotonic() - t0
                b1, t1j = jif()
                # busy cores on the whole box during the build (includes
                # everything, but the box should be otherwise idle)
                busy_cores = (b1 - b0) / ((t1j - t0j) or 1) * (
                    os.cpu_count() or 1
                )
                print(json.dumps({
                    "cpus": args.cpus,
                    "docs": args.docs,
                    "build_sec": round(wall, 2),
                    "docs_per_sec": round(args.docs / wall, 1),
                    "busy_cores_avg": round(busy_cores, 2),
                    "phase_ms": b._phase_ms,
                }), flush=True)
    finally:
        spark.stop()
        if own_pages:
            import shutil

            shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
