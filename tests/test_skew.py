"""Skew handling: the Zipf hot term (~10% of all tokens) must not
concentrate — doc-range sharding splits every posting list structurally, so
shard loads stay balanced and the hot term's per-shard lists are bounded."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from similaripy_spark.fulltext.index_build import (
    IndexBuilder,
    read_lineage,
    read_metrics,
    read_segments,
)
from similaripy_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skewidx"))
    pages = generate_pages(spark, 2000, vocab_size=2000)
    IndexBuilder(d, shard_size=250, n_groups=4).build(pages)
    return d


def test_hot_term_split_across_all_shards(spark, built):
    seg = read_segments(spark, built)
    hot = seg.filter(F.col("term") == "t000000")
    per_shard = hot.groupBy("shard").agg(F.sum("n").alias("n")).collect()
    n_shards = seg.select("shard").distinct().count()
    assert len(per_shard) == n_shards  # the stopword appears in EVERY shard
    loads = [r["n"] for r in per_shard]
    assert max(loads) <= 2 * (sum(loads) / len(loads)), loads


def test_shard_load_balance(spark, built):
    """Postings per shard within 2× of the mean despite Zipf skew —
    doc-sharding makes the build shuffle uniform by construction."""
    seg = read_segments(spark, built)
    loads = [
        r["n"] for r in seg.groupBy("shard").agg(F.sum("n").alias("n")).collect()
    ]
    mean = sum(loads) / len(loads)
    assert max(loads) < 2 * mean, loads
    assert min(loads) > 0.3 * mean, loads


def test_lineage_and_metrics_tables(spark, built):
    lin = read_lineage(spark, built)
    assert lin.count() == 4
    assert lin.filter("status = 'done'").count() == 4
    met = read_metrics(spark, built)
    names = {r["metric"] for r in met.select("metric").distinct().collect()}
    assert {"blocks", "postings", "bytes", "wall_ms", "n_docs", "avgdl"} <= names
    total_postings = (
        met.filter("metric = 'postings'").agg(F.sum("value")).first()[0]
    )
    seg_postings = read_segments(spark, built).agg(F.sum("n")).first()[0]
    assert int(total_postings) == int(seg_postings)


def test_s_plus_max_df_drops_hot_dimensions(spark):
    """The similarity path's hot-dimension cap: s_plus(m, max_df=d) must be
    exactly s_plus on the matrix with >d-df dimensions removed — the
    intrinsic |postings(hot_col)|² pair blow-up is bounded by construction
    (Spark-era analog of the reference's popularity machinery,
    s_plus_utils.pyx:493-618)."""
    import numpy as np

    import similaripy_spark as sps

    rng = np.random.default_rng(7)
    rows = []
    for r in range(200):
        # a planted stopword dimension 0 present in EVERY row + sparse tail
        rows.append((r, 0, float(rng.integers(1, 5))))
        for c in rng.choice(np.arange(1, 80), size=6, replace=False):
            rows.append((r, int(c), float(rng.integers(1, 5))))
    m = spark.createDataFrame(rows, "row long, col long, value double")

    capped = sps.cosine(m, k=10, max_df=50).toPandas()
    manual = sps.cosine(m.filter("col != 0"), k=10).toPandas()
    a = capped.sort_values(["row", "col"]).reset_index(drop=True)
    b = manual.sort_values(["row", "col"]).reset_index(drop=True)
    assert (a.row == b.row).all() and (a.col == b.col).all()
    np.testing.assert_allclose(a.value, b.value, rtol=1e-12)

    # and the cap is inert when nothing exceeds it
    inert = sps.cosine(m, k=10, max_df=10_000).toPandas()
    full = sps.cosine(m, k=10).toPandas()
    a = inert.sort_values(["row", "col"]).reset_index(drop=True)
    b = full.sort_values(["row", "col"]).reset_index(drop=True)
    assert (a.col == b.col).all()
    np.testing.assert_allclose(a.value, b.value, rtol=1e-12)
