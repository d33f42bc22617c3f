"""Per-stage attribution of the index build via Spark's status REST API.

Prints executor runtime / CPU time / shuffle+IO bytes for every stage of
one timed 300k-doc build (after a warm-up build), separating map-side
(tokenize+shuffle-write), reduce-side (encode+parquet-write) and the
doc_stats/term_stats jobs. This is the tool that located the JVM row sort
as the reduce stage's dominant CPU (round 4: 106 s of 130 s executor
runtime at local[8]) and motivated the encoder's in-kernel lexsort.

Usage: python tools/profile_stages.py [--cpus 8] [--docs 300000]
"""

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs", type=int, default=300000)
    ap.add_argument("--vocab", type=int, default=100000)
    args = ap.parse_args()

    from bench import _pregen_pages
    from similaripy_spark.session import get_spark
    from similaripy_spark.fulltext.index_build import IndexBuilder
    from pyspark.sql import functions as F

    pages_dir = tempfile.mkdtemp(prefix="prof_pages_")
    _pregen_pages(os.cpu_count() or 8, args.docs, args.vocab, pages_dir)
    spark = get_spark(
        parallelism=args.cpus,
        shuffle_partitions=2 * args.cpus,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    try:
        pages = spark.read.parquet(pages_dir).persist()
        pages.count()
        with tempfile.TemporaryDirectory() as d:
            IndexBuilder(
                os.path.join(d, "w"), shard_size=2500, n_groups=4,
                input_layout="shuffle",
            ).build(pages.filter(F.col("doc_id") < 20000))
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId

        def stages():
            return json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
            ))

        seen = {s["stageId"] for s in stages()}
        with tempfile.TemporaryDirectory() as d:
            t0 = time.monotonic()
            IndexBuilder(
                os.path.join(d, "idx"),
                shard_size=max(args.docs // 64, 512),
                n_groups=4, input_layout="shuffle",
            ).build(pages)
            print(f"build wall {time.monotonic() - t0:.2f}s")
        print(f"{'id':>4} {'runTime_s':>9} {'cpuTime_s':>9} {'tasks':>5} "
              f"{'shufW_MB':>8} {'shufR_MB':>8} {'in_MB':>7} {'out_MB':>7}")
        for s in sorted(stages(), key=lambda x: x["stageId"]):
            if s["stageId"] in seen:
                continue
            print(f"{s['stageId']:>4} "
                  f"{s.get('executorRunTime', 0) / 1000:>9.1f} "
                  f"{s.get('executorCpuTime', 0) / 1e9:>9.1f} "
                  f"{s.get('numTasks'):>5} "
                  f"{s.get('shuffleWriteBytes', 0) / 1e6:>8.1f} "
                  f"{s.get('shuffleReadBytes', 0) / 1e6:>8.1f} "
                  f"{s.get('inputBytes', 0) / 1e6:>7.1f} "
                  f"{s.get('outputBytes', 0) / 1e6:>7.1f}")
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
