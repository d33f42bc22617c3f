"""Streaming ingestion: file-source micro-batches → delta indexes →
compaction equals a from-scratch batch build on the same pages."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from similaripy_spark.fulltext.index_build import IndexBuilder, read_segments
from similaripy_spark.sources.pages import generate_pages
from similaripy_spark.streaming.ingest import StreamingIndexer, dedup_latest_per_url


def test_streaming_deltas_and_compaction(spark, tmp_path):
    import glob
    import shutil

    pages = generate_pages(spark, 400, vocab_size=600).cache()
    src = str(tmp_path / "drops")
    os.makedirs(src)
    # two flat-file drops (the file stream source lists files, not dirs)
    for name, pred in [("drop1", "doc_id < 200"), ("drop2", "doc_id >= 200")]:
        staging = str(tmp_path / f"_stage_{name}")
        pages.filter(pred).coalesce(1).write.parquet(staging)
        part = glob.glob(f"{staging}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")

    root = str(tmp_path / "stream_idx")
    ing = StreamingIndexer(root, shard_size=128, n_groups=2)
    q = ing.start(spark, src, trigger_once=True)
    q.awaitTermination(300)
    if q.exception() is not None:
        raise AssertionError(f"stream failed: {q.exception()}")
    deltas = ing.delta_dirs()
    assert len(deltas) >= 1
    # all docs indexed exactly once across deltas
    total = sum(
        read_segments(spark, d).select(F.explode(F.array(F.col("n")))).count()
        for d in deltas
    )
    compacted = ing.compact(spark)

    ref = str(tmp_path / "ref_idx")
    IndexBuilder(ref, shard_size=128, n_groups=2).build(pages)
    sm = read_segments(spark, compacted).orderBy("shard", "term", "block_id").toPandas()
    sf = read_segments(spark, ref).orderBy("shard", "term", "block_id").toPandas()
    pd.testing.assert_frame_equal(
        sm.reset_index(drop=True), sf.reset_index(drop=True)
    )


def test_dedup_latest_per_url(spark):
    rows = [
        (1, "https://a.test/x", "2026-01-01 00:00:00", b"", "old text", "en"),
        (2, "https://a.test/x", "2026-01-02 00:00:00", b"", "new text", "en"),
        (3, "https://b.test/y", "2026-01-01 00:00:00", b"", "only", "en"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = dedup_latest_per_url(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [2, 3]
    assert out[0]["text"] == "new text"
