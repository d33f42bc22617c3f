"""Append-only ingestion: grow a committed index without rewriting it.

The 'raw' weight scheme makes this EXACT. BM25 has three corpus-global
inputs — idf (from term_stats), N and avgdl — and one doc-local factor.
A 'factored' index bakes avgdl into its stored tf-parts, so appending
documents (which shifts avgdl) would leave every committed block slightly
stale; ``index_merge.merge_indexes`` handles that by decoding and
re-weighting everything — a rebuild. A 'raw' index stores (tf, dl) and
derives the tf-part in the query kernel at the CURRENT avgdl
(wand._ShardIndex), so an append is just:

1. delta doc_stats epoch (staged, validated, committed) — new documents
   must land in NEW shards (min doc_id ≥ n_shards × shard_size), so no
   committed shard is ever touched;
2. delta segment groups at ``group_base = n_groups`` — the same
   one-wide-exchange segment job as a fresh build, committed per group
   through the same lineage protocol (a crashed append re-runs and skips
   committed delta groups);
3. term_stats recomputed over committed block metadata (idempotent — safe
   to re-run after any crash; at web scale an incremental merge of the
   delta groups' stats into the old table under a two-phase versioned
   commit would avoid the full metadata scan, at the cost of a
   non-idempotent stats step);
4. meta.json swap: N, sum_dl → avgdl, n_shards, n_groups, epochs. Readers
   pick up the new scalars atomically (publish_json); ``bounds_avgdl``
   stays PINNED at the first build's value — block score bounds are
   ratio-scaled at read time (wand._ShardIndex.term_meta), so MaxScore/BMW
   pruning stays exact under any drift.

Equivalence contract (pinned in tests/test_append.py):
``build(A ∪ B)`` and ``build(A); append(B)`` return BIT-IDENTICAL query
results — same shard assignment (doc_id // shard_size), same stored
(tf, dl), and the kernel applies the same merged-corpus scalars.

The term-major ``merged/`` layout is segment-derived and would silently
miss appended documents, so a successful append RENAMES it to
``merged_stale_epoch<E>`` (never deletes); re-run
``index_merge.merge_to_term_major`` to rebuild it. Open ``IndexHandle``s
hold the pre-append meta/segment cache — reopen after an append.

Cost of the capability — MEASURED (100k docs / 50k vocab, 10k-query
batch, local[8], warm, 2026-08-18): build factored 12.0 s vs raw 9.7 s
(raw is FASTER — its weighting pass is a pure projection, no expression
work in the segment job); query batch factored 15.7 s vs raw 15.5 s
(parity — the per-decode tf varint expansion + tf-part arithmetic is
noise next to the shard sweep). Choosing append-capability costs nothing
at serve time.

Reference parity note: the reference (bogliosimone/similaripy) has no
incremental path at all — its CSR matrices are rebuilt per call
(similaripy/normalization.py recomputes stats on every invocation); this
module is part of the engine's web-scale extension surface, same category
as the streaming dedup operator.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similaripy_spark.fulltext.index_build import (
    IndexBuilder,
    read_meta,
)
from similaripy_spark.fulltext.postings import build_postings, doc_lengths


def append_to_index(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame | None = None,
    postings: DataFrame | None = None,
    *,
    n_groups: int = 8,
    n_docs: int | None = None,
    encoder: str | None = None,
    input_layout: str = "shuffle",
) -> dict:
    """Append new documents to a committed 'raw'-scheme index; returns the
    updated meta dict. Pass ``pages`` (doc_id, text[, lang]) or a
    pre-tokenized ``postings`` relation (doc_id, term, tf, dl).

    Every appended doc_id must be ≥ ``n_shards × shard_size`` (the next
    fresh shard boundary) — validated on the delta's own stats pass before
    anything is committed. ``n_groups`` is the number of commit units for
    THIS epoch. ``n_docs`` pins the declared delta size (reference N
    semantics — empty docs count if the caller says so).
    """
    meta = read_meta(index_dir)
    scheme = meta.get("weight_scheme", "prod")
    if scheme != "raw":
        raise ValueError(
            f"append_to_index requires weight_scheme='raw' (got "
            f"{scheme!r}): '{scheme}' blocks bake corpus stats that an "
            "append would leave stale — use index_merge.merge_indexes "
            "(decode + re-weight) for those, or rebuild with "
            "IndexBuilder(weight_scheme='raw') to make the index "
            "append-capable"
        )
    shard_size = int(meta["shard_size"])
    base_shard = int(meta["n_shards"])
    base_group = int(meta["n_groups"])
    base_doc = base_shard * shard_size
    epoch = int(meta.get("n_epochs", 1))  # epoch 0 = the initial build
    run_id = uuid.uuid4().hex[:12]

    if (pages is None) == (postings is None):
        raise ValueError("pass exactly one of pages / postings")
    lang = meta.get("lang")
    postings_input = pages is None
    if pages is not None:
        if lang is not None:
            pages = pages.filter(F.col("lang") == lang)
        postings = build_postings(pages)
    if postings_input:
        # the caller's relation feeds BOTH the phase-1 stats job and the
        # phase-2 segment job — persist so its upstream DAG runs once
        # (the builder's own policy for stats-from-postings; the pages
        # path instead re-tokenizes for the count-only stats pass, the
        # measured-cheaper trade)
        postings = postings.persist()

    from similaripy_spark.fulltext.commit import detect_commit_protocol

    builder = IndexBuilder(
        index_dir,
        k1=float(meta.get("k1", 1.2)),
        b=float(meta.get("b", 0.75)),
        block_size=int(meta["block_size"]),
        shard_size=shard_size,
        n_groups=int(n_groups),
        input_layout=input_layout,
        encoder=encoder or "arrow",
        weight_scheme="raw",
        # match the base index's backend: rename-committed delta groups
        # beside pointer-committed ones would be invisible to readers
        # (resolve_artifact_multi returns only pointer entries)
        commit=detect_commit_protocol(index_dir),
    )
    builder.group_base = base_group
    # block bounds stay comparable across epochs: encode them at the SAME
    # pinned avgdl the original build used (readers ratio-scale to current)
    builder._bounds_avgdl = float(meta.get("bounds_avgdl", meta["avgdl"]))
    t0 = time.monotonic()

    # ---- phase 1: delta doc_stats (staged → validated → committed) ------
    from pyspark.sql import Observation

    if pages is not None:
        ds = doc_lengths(pages).filter(F.col("dl") > 0)
    else:
        ds = postings.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    ds = ds.withColumn(
        "shard", (F.col("doc_id") / shard_size).cast("int")
    )
    obs = Observation(f"append_epoch_{epoch}")
    ds_path = os.path.join(index_dir, f"doc_stats_epoch_{epoch}")
    ds_tmp = builder.commit.stage_path(ds_path)
    (
        ds.observe(
            obs,
            F.count(F.lit(1)).alias("n_seen"),
            F.sum(F.col("dl").cast("double")).alias("sum_dl"),
            F.max("shard").alias("max_shard"),
            F.min("doc_id").alias("min_doc"),
        )
        .write.mode("overwrite")
        .parquet(ds_tmp)
    )
    m = obs.get
    n_seen = int(m["n_seen"] or 0)
    min_doc = m["min_doc"]
    if n_seen == 0:
        builder.commit.discard(ds_tmp)
        raise ValueError("append delta holds no non-empty documents")
    if int(min_doc) < base_doc:
        builder.commit.discard(ds_tmp)
        raise ValueError(
            f"appended doc_ids must start at the next shard boundary "
            f"(≥ {base_doc} = n_shards {base_shard} × shard_size "
            f"{shard_size}); got min doc_id {int(min_doc)} — committed "
            "shards are immutable"
        )
    builder.commit.commit_dir(ds_tmp, ds_path)
    n_delta = int(n_docs) if n_docs is not None else n_seen
    delta_shards = int(m["max_shard"]) - base_shard + 1

    # ---- phase 2: delta segment groups (same job shape as a build) ------
    weighted = postings.select(
        "doc_id", "term", "tf", "dl",
        F.col("dl").cast("double").alias("weight"),
    ).withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
    done = builder.committed_groups()
    pending = [
        g for g in range(base_group, base_group + int(n_groups))
        if g not in done
    ]
    if pending:
        builder._build_groups_batched(weighted, pending, delta_shards, run_id)

    # ---- phase 3: term_stats (full recompute — idempotent) ---------------
    builder.n_groups = base_group + int(n_groups)  # the all-committed gate
    builder._write_term_stats(spark)

    # ---- phase 4: meta swap (atomic publish) -----------------------------
    sum_dl0 = float(meta.get("sum_dl", meta["avgdl"] * meta["n_docs"]))
    sum_dl = sum_dl0 + float(m["sum_dl"] or 0.0)
    n_total = int(meta["n_docs"]) + n_delta
    new_meta = dict(meta)
    new_meta.update(
        {
            "n_docs": n_total,
            "sum_dl": sum_dl,
            "avgdl": sum_dl / max(n_total, 1),
            "bounds_avgdl": float(meta.get("bounds_avgdl", meta["avgdl"])),
            "n_shards": max(base_shard, int(m["max_shard"]) + 1),
            "n_groups": base_group + int(n_groups),
            "n_epochs": epoch + 1,
            "last_append": {
                "epoch": epoch,
                "run_id": run_id,
                "n_docs_delta": n_delta,
                "groups": [base_group, base_group + int(n_groups)],
                "wall_ms": int((time.monotonic() - t0) * 1000),
            },
        }
    )
    # ---- invalidate the (segment-derived) merged layout BEFORE the meta
    # swap: with the old order a crash between the two left a COMPLETED
    # append (meta published, no re-run) whose term-major layout silently
    # missed every appended doc forever. Renaming first is safe — a crash
    # after the rename merely invalidates merged/ early, and the re-run
    # finishes the meta swap.
    merged = os.path.join(index_dir, "merged")
    if os.path.isdir(merged):
        os.rename(merged, os.path.join(
            index_dir, f"merged_stale_epoch_{epoch}"
        ))
    builder.commit.publish_json(
        os.path.join(index_dir, "meta.json"), new_meta
    )
    if postings_input:
        postings.unpersist()
    return new_meta


def read_doc_stats_all(spark: SparkSession, index_dir: str) -> DataFrame:
    """doc_stats across every epoch (the initial build's table plus each
    committed ``doc_stats_epoch_*`` delta)."""
    from similaripy_spark.fulltext.commit import resolve_artifact

    parts = [resolve_artifact(os.path.join(index_dir, "doc_stats"))]
    n_epochs = int(read_meta(index_dir).get("n_epochs", 1))
    for e in range(1, n_epochs):
        p = os.path.join(index_dir, f"doc_stats_epoch_{e}")
        if os.path.isdir(p) or os.path.exists(p + ".ptr.json"):
            parts.append(resolve_artifact(p))
    return spark.read.parquet(*parts)
