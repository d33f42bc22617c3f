"""Index merge & the term-major global layout.

Two merge-shaped operations, both operating on COMPRESSED blocks (the raw
postings are never re-shuffled):

* ``merge_to_term_major`` — re-groups the doc-sharded segments by term bucket
  (``crc32(term) % n_buckets``) into a partition-pruned global layout: a
  selective query touches only its terms' bucket directories (Catalyst
  partition pruning on ``term_bucket``), the physical analog of the
  reference's array-selector pre-filter (s_plus_utils.pyx:424-490). Blocks
  stay doc-sorted per (term, shard, block_id), so posting lists concatenate
  without re-sorting — the "k-way merge" is free by construction.
* ``merge_indexes`` — incremental ingestion: decode N delta indexes back to
  postings (one vectorized pass over blocks), union, re-weight with the
  merged global stats (df/avgdl/N change when docs arrive — BM25 weights are
  corpus-global, so a correct merge MUST re-weight), and rebuild via the
  same checkpoint-resumable builder.

``decode_segments`` is the shared block→postings expansion (also the index
introspection tool).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from similaripy_spark.fulltext import codec
from similaripy_spark.fulltext.index_build import (
    IndexBuilder,
    read_doc_stats,
    read_meta,
    read_segments,
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)


def term_bucket(term_col, n_buckets: int):
    return (F.crc32(term_col.cast("string")) % n_buckets).cast("int")


def merge_to_term_major(
    spark: SparkSession, index_dir: str, n_buckets: int = 64
) -> str:
    """segments → index_dir/merged/term_bucket=B/… (returns path)."""
    seg = read_segments(spark, index_dir)
    out = os.path.join(index_dir, "merged")
    (
        seg.withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
        .repartition("term_bucket")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(out)
    )
    return out


def read_merged_for_terms(
    spark: SparkSession, index_dir: str, terms: list[str], n_buckets: int = 64
) -> DataFrame:
    """Partition-pruned scan: only the buckets of the requested terms are
    read (visible as PartitionFilters in .explain)."""
    import zlib

    buckets = sorted({zlib.crc32(t.encode()) % n_buckets for t in terms})
    merged = spark.read.parquet(os.path.join(index_dir, "merged"))
    return merged.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(list(terms))
    )


def decode_segments(segments: DataFrame) -> DataFrame:
    """Compressed blocks → postings (doc_id, term, tf); vectorized decode."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            docs_parts, tf_parts, term_parts = [], [], []
            for r in b.itertuples(index=False):
                deltas = codec.decode_varints(r.doc_deltas, r.n)
                docs_parts.append(codec.delta_decode(deltas, r.first_doc))
                tf_parts.append(
                    codec.decode_varints(r.tfs, r.n).astype(np.int32)
                )
                term_parts.append(np.repeat(r.term, r.n))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(docs_parts),
                    "term": np.concatenate(term_parts),
                    "tf": np.concatenate(tf_parts),
                }
            )

    return segments.mapInPandas(expand, schema=_DECODED_SCHEMA)


def merge_indexes(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    **builder_kwargs,
) -> dict:
    """Union N indexes (disjoint doc_id spaces assumed — enforce upstream) and
    rebuild with merged global BM25 stats. Returns new meta."""
    postings_parts = []
    for d in index_dirs:
        decoded = decode_segments(read_segments(spark, d))
        ds = read_doc_stats(spark, d).select("doc_id", "dl")
        postings_parts.append(decoded.join(ds, "doc_id"))
    merged = postings_parts[0]
    for p in postings_parts[1:]:
        merged = merged.unionByName(p)

    ref_meta = read_meta(index_dirs[0])
    kwargs = dict(
        k1=ref_meta["k1"],
        b=ref_meta["b"],
        block_size=ref_meta["block_size"],
        shard_size=ref_meta["shard_size"],
        n_groups=ref_meta["n_groups"],
    )
    kwargs.update(builder_kwargs)
    builder = IndexBuilder(out_dir, **kwargs)
    return builder.build_from_postings(merged)
