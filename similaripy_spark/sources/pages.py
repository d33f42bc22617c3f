"""Deterministic distributed generator for the Common-Crawl-style ``pages``
table (BASELINE.json input_hint: url string, warc_ts timestamp, html binary,
text string, lang string) per FIXTURES.md §1.

Fully vectorized and partition-independent: every random draw is a pure
function of (seed, doc_id, position) via a splitmix64-style counter hash, so
the same (seed, n_docs, vocab_size) always yields byte-identical text per url
regardless of partitioning — the per-row invariant the north rule demands.
Token distribution is Zipf(s) over the vocabulary (hot term ``t000000`` lands
in ~10% of positions at the default s), document lengths are lognormal
(median ≈120, clipped to [5, 2000]) via Box–Muller on two counter hashes.

Scales: ``spark.range(n_docs)`` + ``mapInPandas`` → no driver materialization;
at 10^12 docs this is the same plan with more input splits.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

_EPOCH = np.datetime64("2026-01-01T00:00:00")

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a public-domain bit mixer; vectorized uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _uniform01(key: np.ndarray) -> np.ndarray:
    """Hash → float64 in [0, 1)."""
    return (_mix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def zipf_cdf(vocab_size: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    w = ranks**-s
    return np.cumsum(w) / w.sum()


def doc_lengths(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """Lognormal via Box–Muller on two counter hashes; median ≈ 120."""
    base = doc_ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(seed)
    u1 = _uniform01(base)
    u2 = _uniform01(base ^ np.uint64(0xDEADBEEFCAFEF00D))
    u1 = np.clip(u1, 1e-12, 1.0)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    lengths = np.exp(np.log(120.0) + 0.6 * z)
    return np.clip(lengths, 5, 2000).astype(np.int64)


def tokens_for_docs(
    doc_ids: np.ndarray, seed: int, cdf: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat token-index array, per-doc lengths). Token at position p of
    doc d = inverse-CDF(zipf)(hash(d, p)) — pure function of (seed, d, p)."""
    lengths = doc_lengths(doc_ids, seed)
    reps = np.repeat(doc_ids.astype(np.uint64), lengths)
    pos = np.concatenate([np.arange(n, dtype=np.uint64) for n in lengths])
    key = (
        reps * np.uint64(0x9E3779B97F4A7C15)
        + pos * np.uint64(0xBF58476D1CE4E5B9)
        + np.uint64(seed * 7919)
    )
    u = _uniform01(key)
    tok_idx = np.searchsorted(cdf, u, side="right")
    return tok_idx, lengths


def _texts_for_docs(doc_ids: np.ndarray, seed: int, vocab_size: int) -> list[str]:
    cdf = zipf_cdf(vocab_size)
    tok_idx, lengths = tokens_for_docs(doc_ids, seed, cdf)
    vocab = np.array([f"t{i:06d}" for i in range(vocab_size)])
    words = vocab[tok_idx]
    out = []
    start = 0
    for n in lengths:
        out.append(" ".join(words[start : start + n]))
        start += n
    return out


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 2000,
    seed: int = 42,
    partitions: int | None = None,
    align_to: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table.

    ``align_to``: partition the output so every partition covers a
    contiguous doc range that is a whole multiple of ``align_to`` (the
    index shard size) — the layout a production crawl table stores as
    Iceberg ``bucket``/range partitioning, which lets the index build skip
    its global shuffle (IndexBuilder ``input_layout='aligned'``). Rows are
    byte-identical to the unaligned generator; only the partitioning
    differs (pure function of (seed, doc_id))."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            texts = _texts_for_docs(ids, seed, vocab_size)
            host = ids % 9973
            urls = [
                f"https://example-{h:06d}.test/p/{d:08d}"
                for h, d in zip(host, ids)
            ]
            ts = pd.Series(_EPOCH + ids.astype("timedelta64[s]"))
            html = [
                b"<html><body>" + t.encode() + b"</body></html>" for t in texts
            ]
            lang = np.where(ids % 20 == 0, "xx", "en")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": urls,
                    "warc_ts": ts,
                    "html": html,
                    "text": texts,
                    "lang": lang,
                }
            )

    if align_to is not None:
        import math as _math

        span = max(
            align_to,
            _math.ceil(n_docs / partitions / align_to) * align_to,
        )
        n_parts = max(_math.ceil(n_docs / span), 1)

        # Stream the span in chunks (multiples of align_to) so per-task
        # memory is bounded by the chunk, not the whole span — alignment
        # only requires the PARTITION boundary to sit on an align_to
        # multiple, which chunking within the task preserves.
        chunk = align_to * max(1, -(-10_000 // align_to))

        def gen_aligned(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                for p in b["id"].to_numpy(dtype=np.int64):
                    lo, hi = p * span, min((p + 1) * span, n_docs)
                    for c0 in range(lo, hi, chunk):
                        ids_pdf = pd.DataFrame(
                            {
                                "id": np.arange(
                                    c0, min(c0 + chunk, hi), dtype=np.int64
                                )
                            }
                        )
                        yield from gen(iter([ids_pdf]))

        # one row per partition → each task generates one aligned doc range
        return (
            spark.range(0, n_parts, numPartitions=n_parts)
            .mapInPandas(gen_aligned, schema=PAGES_SCHEMA)
        )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def generate_pages_pandas(n_docs: int, vocab_size: int = 2000, seed: int = 42):
    """Driver-side twin of generate_pages (identical bytes) for test oracles."""
    ids = np.arange(n_docs, dtype=np.int64)
    texts = _texts_for_docs(ids, seed, vocab_size)
    return pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": np.where(ids % 20 == 0, "xx", "en"),
        }
    )


def generate_queries_pandas(
    n_queries: int, vocab_size: int = 2000, seed: int = 43, max_terms: int = 8
) -> pd.DataFrame:
    """Query table per FIXTURES.md §3: 1–8 Zipf-sampled terms per query,
    deterministic in (seed, query_id)."""
    cdf = zipf_cdf(vocab_size)
    qids = np.arange(n_queries, dtype=np.uint64)
    n_terms = (
        _mix64(qids * np.uint64(31) + np.uint64(seed)) % np.uint64(max_terms)
    ).astype(np.int64) + 1
    rows = []
    for q, n in zip(qids.astype(np.int64), n_terms):
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            keys = (
                np.uint64(q) * np.uint64(0x9E3779B97F4A7C15)
                + np.arange(n, dtype=np.uint64) * np.uint64(0x94D049BB133111EB)
                + np.uint64(seed * 104729)
            )
        idx = np.searchsorted(cdf, _uniform01(keys), side="right")
        terms = sorted({f"t{i:06d}" for i in idx})
        rows.append((int(q), terms))
    return pd.DataFrame(rows, columns=["query_id", "terms"])
