"""Codec round-trip, SPIMI build, checkpoint/resume, and segment-query
parity (exhaustive + Block-Max MaxScore pruned) vs the relational SQL path."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from similaripy_spark.fulltext import codec
from similaripy_spark.fulltext.index_build import (
    IndexBuilder,
    read_meta,
    read_segments,
    read_term_stats,
)
from similaripy_spark.fulltext.postings import build_postings
from similaripy_spark.fulltext.query import bm25_topk
from similaripy_spark.fulltext.wand import segment_topk
from similaripy_spark.fulltext.weights import bm25_weights
from similaripy_spark.sources.pages import generate_pages, generate_queries_pandas

N_DOCS, VOCAB = 1200, 1500


# --- codec ------------------------------------------------------------------

@pytest.mark.parametrize(
    "values",
    [
        np.array([0], dtype=np.uint64),
        np.array([1, 127, 128, 129, 16383, 16384], dtype=np.uint64),
        np.array([2**63 - 1, 2**64 - 1, 0, 1], dtype=np.uint64),
        np.arange(1000, dtype=np.uint64) ** 3,
    ],
)
def test_varint_roundtrip(values):
    buf = codec.encode_varints(values)
    out = codec.decode_varints(buf, len(values))
    np.testing.assert_array_equal(out, values)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        mags = rng.integers(0, 63, size=500)
        vals = (rng.integers(0, 2**62, size=500).astype(np.uint64)
                >> mags.astype(np.uint64))
        buf = codec.encode_varints(vals)
        np.testing.assert_array_equal(codec.decode_varints(buf, 500), vals)


def test_delta_roundtrip():
    docs = np.sort(np.random.default_rng(1).choice(10**12, 5000, replace=False))
    deltas = codec.delta_encode(docs, int(docs[0]))
    np.testing.assert_array_equal(codec.delta_decode(deltas, int(docs[0])), docs)


# --- build + query -----------------------------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB)
    builder = IndexBuilder(d, shard_size=256, n_groups=4)
    meta = builder.build(pages)
    return d, meta, pages


def test_meta_and_lineage(built):
    d, meta, _ = built
    assert meta["n_docs"] == N_DOCS
    assert meta["n_shards"] == (N_DOCS + 255) // 256
    lin = IndexBuilder(d, shard_size=256, n_groups=4).lineage()
    assert len(lin) == 4
    assert all(r["status"] == "done" and r["postings"] > 0 for r in lin)


def test_build_metrics_published(built):
    """Every build publishes lineage/build_metrics.json — the per-phase
    wall table (north-star metrics artifact; also how round 4 located the
    build's serial costs). It must NOT register as a lineage commit unit."""
    import json as _json

    d, _, _ = built
    p = os.path.join(d, "lineage", "build_metrics.json")
    assert os.path.exists(p)
    m = _json.load(open(p))
    phases = m["phase_ms"]
    for k in ("doc_stats", "segment_job", "footer_stats", "commit",
              "term_stats", "total"):
        assert k in phases, k
    assert phases["total"] >= phases["segment_job"]
    # metrics file is invisible to the group-commit ledger
    assert len(IndexBuilder(d, shard_size=256, n_groups=4).lineage()) == 4


def test_segments_wellformed(spark, built):
    d, meta, _ = built
    seg = read_segments(spark, d)
    bad = seg.filter(
        (F.col("first_doc") > F.col("max_doc"))
        | (F.col("n") <= 0)
        | (F.col("n") > meta["block_size"])
    ).count()
    assert bad == 0
    # postings total matches raw postings count
    total = seg.agg(F.sum("n")).first()[0]
    raw = build_postings(built[2]).count()
    assert total == raw


@pytest.mark.parametrize(
    "mode",
    ["batch", "maxscore", "exhaustive"],
)
def test_segment_query_matches_sql_path(spark, built, mode):
    d, meta, pages = built
    queries_pd = generate_queries_pandas(40, vocab_size=VOCAB)
    queries = spark.createDataFrame(queries_pd)

    weighted = bm25_weights(build_postings(pages))
    expected = (
        bm25_topk(weighted, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    kwargs = dict(
        batch=(mode == "batch"), prune=(mode == "maxscore")
    )
    got = (
        segment_topk(read_segments(spark, d), queries, k=10, index_dir=d,
                     **kwargs)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["query_id"]) == list(expected["query_id"])
    assert list(got["doc_id"]) == list(expected["doc_id"]), (
        f"mode={mode}: rank order diverged"
    )
    np.testing.assert_allclose(got["score"], expected["score"], rtol=1e-4)


def test_segment_query_weighted_matches_sql_path(spark, built):
    """The batch segment scorer's weighted mode (Σ qw·weight, duplicates
    adding) is rank-identical to the relational weighted path."""
    import pandas as pd

    d, meta, pages = built
    queries_pd = generate_queries_pandas(30, vocab_size=VOCAB)
    # positional weights + a planted duplicate term on the first query
    queries_pd["terms"] = queries_pd["terms"].map(list)
    queries_pd.at[0, "terms"] = queries_pd.at[0, "terms"] + [
        queries_pd.at[0, "terms"][0]
    ]
    queries_pd["weights"] = queries_pd["terms"].map(
        lambda ts: [0.5 * (i + 1) for i in range(len(ts))]
    )
    queries = spark.createDataFrame(queries_pd)

    weighted = bm25_weights(build_postings(pages))
    expected = (
        bm25_topk(weighted, queries, k=10, query_weighted=True)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    got = (
        segment_topk(read_segments(spark, d), queries, k=10,
                     query_weighted=True, index_dir=d)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(expected["doc_id"])
    np.testing.assert_allclose(got["score"], expected["score"], rtol=1e-4)
    with pytest.raises(ValueError):
        segment_topk(read_segments(spark, d), queries, k=10,
                     query_weighted=True, batch=False, index_dir=d)


def test_segment_topk_shard_ids_param(spark, built):
    """Passing the known shard list (range(n_shards)) must match the
    discovered-shards default — the param only changes shard ENUMERATION.
    Both calls force weight_scheme='prod' (raw stored factors, no idf) so
    the bare-DataFrame discovery fallback is exercisable on the factored
    fixture index; the assertion compares the two enumeration paths, not
    BM25 semantics (covered elsewhere)."""
    d, meta, pages = built
    queries = spark.createDataFrame(generate_queries_pandas(10, vocab_size=VOCAB))
    seg = read_segments(spark, d)
    a = (
        segment_topk(seg, queries, k=10, weight_scheme="prod")
        .orderBy("query_id", "rank").collect()
    )
    b = (
        segment_topk(seg, queries, k=10, shard_ids=range(meta["n_shards"]),
                     weight_scheme="prod")
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b


def test_segment_topk_index_dir_runs_no_discovery_job(spark, built):
    """segment_topk(index_dir=...) derives the shard list from meta.json —
    a driver-side file read. Plan CONSTRUCTION must launch zero Spark jobs
    (the discovery distinct().collect() is last-resort only), and results
    must match the discovered default."""
    d, meta, pages = built
    queries = spark.createDataFrame(generate_queries_pandas(10, vocab_size=VOCAB))
    seg = read_segments(spark, d)

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    df = segment_topk(seg, queries, k=10, index_dir=d)  # construction only
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "plan construction launched a Spark job"

    a = df.orderBy("query_id", "rank").collect()
    b = (
        segment_topk(seg, queries, k=10, shard_ids=range(meta["n_shards"]),
                     index_dir=d)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b


@pytest.mark.parametrize("k", [100, 1000])
def test_segment_query_large_k(spark, built, k):
    """Deep paging: rank identity vs the relational path at k=100 and
    k=1000 (beyond the reference's k default; k >= n_docs of a shard makes
    every candidate a keeper, exercising the kk == span branch of the
    batch scorer and the full-merge branch of MaxScore)."""
    d, meta, pages = built
    queries = spark.createDataFrame(
        generate_queries_pandas(10, vocab_size=VOCAB)
    )
    expected = (
        bm25_topk(bm25_weights(build_postings(pages)), queries, k=k)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    for kwargs in (dict(batch=True), dict(batch=False, prune=True)):
        got = (
            segment_topk(read_segments(spark, d), queries, k=k,
                         index_dir=d, **kwargs)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == list(expected["doc_id"]), kwargs
        np.testing.assert_allclose(got["score"], expected["score"],
                                   rtol=1e-4)


def test_encoder_parity(spark, tmp_path):
    """All three block encoders commit byte-identical segments on the same
    corpus: 'arrow' (default — in-kernel lexsort over dictionary codes, no
    JVM row sort in the plan), 'arrow_stream' (streams over JVM-presorted
    partitions), 'pandas' (original twin). Compared after orderBy — row
    order inside files is the only thing the encoders may differ on."""
    pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB)

    def seg_pdf(d):
        return (
            read_segments(spark, d)
            .orderBy("shard", "term", "block_id")
            .toPandas().reset_index(drop=True)
        )

    dirs = {}
    for enc in ("arrow", "arrow_stream", "pandas"):
        d = str(tmp_path / enc)
        IndexBuilder(d, shard_size=256, n_groups=2, encoder=enc).build(pages)
        dirs[enc] = seg_pdf(d)
    assert len(dirs["arrow"]) > 0
    assert dirs["arrow"].equals(dirs["arrow_stream"])
    assert dirs["arrow"].equals(dirs["pandas"])


def test_factored_vs_prod_scheme_parity(spark, tmp_path):
    """weight_scheme='factored' (store tf-part, idf at query time — the
    default) must be rank-identical to weight_scheme='prod' (store idf×tf
    products, round-3 format) on the same corpus, scores equal within
    float32-storage tolerance. The factored index stores strictly positive
    block bounds; the prod one stores signed products — both must agree
    through every scorer."""
    d_f, d_p = str(tmp_path / "fac"), str(tmp_path / "prd")
    pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB)
    IndexBuilder(d_f, shard_size=256, n_groups=2,
                 weight_scheme="factored").build(pages)
    IndexBuilder(d_p, shard_size=256, n_groups=2,
                 weight_scheme="prod").build(pages)
    assert read_meta(d_f)["weight_scheme"] == "factored"
    assert read_meta(d_p)["weight_scheme"] == "prod"
    # factored blocks hold the positive doc-local factor only
    seg_f = read_segments(spark, d_f)
    assert seg_f.filter(F.col("min_score") <= 0).count() == 0

    queries = spark.createDataFrame(
        generate_queries_pandas(40, vocab_size=VOCAB)
    )
    for mode_kwargs in (
        dict(batch=True),
        dict(batch=False, prune=True),
        dict(batch=False, prune=False),
    ):
        a = (
            segment_topk(read_segments(spark, d_f), queries, k=10,
                         index_dir=d_f, **mode_kwargs)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        b = (
            segment_topk(read_segments(spark, d_p), queries, k=10,
                         index_dir=d_p, **mode_kwargs)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert list(a["doc_id"]) == list(b["doc_id"]), mode_kwargs
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-4)


def test_segments_with_idf_serve_path_parity(spark, tmp_path):
    """segments_with_idf pre-joins idf onto a factored index's segments
    (one-time, at load) — scoring through it must be IDENTICAL (doc ids
    and float-exact scores: same kernel arithmetic, only the idf lookup
    source differs) to the per-batch query-side annotation, across the
    batch scorer, MaxScore, and exhaustive paths."""
    from similaripy_spark.fulltext.wand import segments_with_idf

    d = str(tmp_path / "fac_serve")
    pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB)
    IndexBuilder(d, shard_size=256, n_groups=2,
                 weight_scheme="factored").build(pages)
    assert read_meta(d)["weight_scheme"] == "factored"
    queries = spark.createDataFrame(
        generate_queries_pandas(40, vocab_size=VOCAB)
    )
    plain = read_segments(spark, d)
    served = segments_with_idf(plain, d)
    assert "idf" in served.columns and "idf" not in plain.columns
    for mode_kwargs in (
        dict(batch=True),
        dict(batch=False, prune=True),
        dict(batch=False, prune=False),
    ):
        a = (
            segment_topk(plain, queries, k=10, index_dir=d, **mode_kwargs)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        b = (
            segment_topk(served, queries, k=10, index_dir=d, **mode_kwargs)
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert list(a["doc_id"]) == list(b["doc_id"]), mode_kwargs
        np.testing.assert_array_equal(
            a["score"].to_numpy(), b["score"].to_numpy()
        )


def test_resume_adopts_committed_scheme(spark, tmp_path):
    """A resumed build must keep the scheme of the already-committed groups
    even if the resuming builder was constructed with a different one —
    mixing factored and product blocks in one index would silently corrupt
    scores."""
    d = str(tmp_path / "mix")
    pages = generate_pages(spark, 600, vocab_size=800)
    with pytest.raises(RuntimeError, match="injected failure"):
        IndexBuilder(d, shard_size=256, n_groups=3,
                     weight_scheme="prod").build(pages, fail_after_groups=1)
    b = IndexBuilder(d, shard_size=256, n_groups=3)  # default: factored
    b.build(pages)
    assert b.weight_scheme == "prod"
    assert read_meta(d)["weight_scheme"] == "prod"


def test_resume_after_injected_failure(spark, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    pages = generate_pages(spark, 600, vocab_size=800)

    # uninterrupted reference build
    IndexBuilder(d1, shard_size=128, n_groups=4).build(pages)

    # interrupted build: crash after 2 of 4 group commits
    b2 = IndexBuilder(d2, shard_size=128, n_groups=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        b2.build(pages, fail_after_groups=2)
    assert len(b2.committed_groups()) == 2

    # resume recomputes exactly the missing groups
    b2.build(pages, resume=True)
    assert len(b2.committed_groups()) == 4

    s1 = read_segments(spark, d1).orderBy("shard", "term", "block_id").toPandas()
    s2 = read_segments(spark, d2).orderBy("shard", "term", "block_id").toPandas()
    pd.testing.assert_frame_equal(s1, s2)


def test_term_stats(spark, built):
    d, _, pages = built
    ts = read_term_stats(spark, d).toPandas().set_index("term")
    raw = (
        build_postings(pages)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .toPandas()
        .set_index("term")
    )
    assert ts["df"].to_dict() == raw["df"].to_dict()
    assert (ts["max_weight"] >= ts["min_weight"]).all()


def test_term_stats_driver_path_matches_spark_job(spark, tmp_path, monkeypatch):
    """The small-index driver-side term_stats aggregate (pyarrow over the
    committed block metadata) must be value- AND dtype-identical to the
    Spark-job aggregate it replaces below the block-count gate."""
    from similaripy_spark.fulltext.index_build import read_term_stats

    pages = generate_pages(spark, 700, vocab_size=900)
    d_drv = str(tmp_path / "ts_drv")
    IndexBuilder(d_drv, shard_size=256, n_groups=2).build(pages)
    d_job = str(tmp_path / "ts_job")
    monkeypatch.setenv("SIMILARIPY_TERM_STATS_DRIVER_MAX_BLOCKS", "0")
    IndexBuilder(d_job, shard_size=256, n_groups=2).build(pages)
    a = read_term_stats(spark, d_drv)
    b = read_term_stats(spark, d_job)
    assert a.schema == b.schema
    pa_, pb_ = (
        x.toPandas().sort_values("term").reset_index(drop=True)
        for x in (a, b)
    )
    assert list(pa_["term"]) == list(pb_["term"])
    np.testing.assert_array_equal(pa_["df"], pb_["df"])
    np.testing.assert_array_equal(pa_["max_weight"], pb_["max_weight"])
    np.testing.assert_array_equal(pa_["min_weight"], pb_["min_weight"])
