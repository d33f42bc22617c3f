"""Deduplication operators for large-scale training-data pipelines.

All of these are compositions of built-in DataFrame ops (joins, windows,
aggregates) — no UDFs — so every one of them has an exact ANSI-SQL oracle
twin and scales through Catalyst/AQE:

* ``dedup_exact``        — hash-groupBy exact duplicate clustering
* ``word_shingles``      — word n-gram shingling (window ``lead``)
* ``ngram_jaccard_pairs``— exact n-gram Jaccard similarity join
* ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash + banded LSH
* ``simhash``            — per-doc SimHash value + near-dup pairs by
  Hamming distance (``bit_count(xor)``)

Scale notes: the shingle self-join is the quadratic danger zone — LSH
(banding) is the scale path and the exact Jaccard join is the verifier run
on LSH candidates only (``verify=True``). Hash functions are explicit
integer polynomials over *dictionary-encoded* shingle/term ids
(``dense_rank`` over the distinct set) so results are engine-independent —
no reliance on any engine's builtin hash().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from similaripy_spark.fulltext.tokenizer import tokenize_expr

# deterministic LCG-style constants (Knuth multiplicative hashing)
_HA = 2654435761
_HB = 40503
_PRIME = 2038074743  # < 2^31, keeps a*x+b inside int64
_M31 = 2147483647  # Mersenne prime 2^31-1 (MINSTD modulus)


def _mix_bit(term_id, bit):
    """Pseudo-random bit g(term_id, bit) via MINSTD steps interleaved with
    xor-shifts (pure int64 arithmetic — identical in any SQL engine; plain
    modular multiplication alone is too linear and collapses patterns)."""
    x = (term_id * 48271 + (bit + 1) * 16807) % _M31
    x = (x.bitwiseXOR(F.shiftright(x, 7)) * 48271) % _M31
    x = (x.bitwiseXOR(F.shiftright(x, 11)) * 16807) % _M31
    return x.bitwiseXOR(F.shiftright(x, 5)) % 2


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, canonical_id, group_size): canonical = min id per
    normalized-text md5 group; rows with group_size == 1 are unique."""
    h = F.md5(F.lower(F.col(text_col)))
    w = Window.partitionBy("text_hash")
    return (
        docs.select(F.col(id_col).alias("doc_id"), h.alias("text_hash"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select("doc_id", "canonical_id", "group_size")
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ distinct (doc_id, shingle) word n-grams via windowed lead —
    identical SQL runs on any engine with window functions."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_expr(F.col(text_col))).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
    sh = toks.withColumn("shingle", F.concat_ws(" ", *parts))
    if n > 1:
        # drop tail positions where lead() ran off the document (window
        # results must be materialized as columns before filtering)
        sh = sh.withColumn(
            "_complete", F.lead("term", n - 1).over(w).isNotNull()
        ).filter(F.col("_complete"))
    return sh.select("doc_id", "shingle").distinct()


def _shingle_ids(shingles: DataFrame) -> DataFrame:
    """Dictionary-encode shingles deterministically: dense_rank over the
    sorted distinct shingle set (engine-independent)."""
    ids = (
        shingles.select("shingle")
        .distinct()
        .withColumn(
            "shingle_id",
            F.dense_rank().over(Window.orderBy("shingle")).cast("long"),
        )
    )
    return shingles.join(ids, "shingle").select("doc_id", "shingle_id")


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Without ``candidates`` this is the exact similarity self-join (quadratic
    in co-shingled docs — verifier-scale only); pass the LSH candidate pairs
    to make it the scale-path verification step.
    """
    sh = word_shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))

    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("sb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, h, minhash): h-th MinHash of the doc's shingle-id set with
    h_i(x) = (a_i·x + b_i) mod P, a_i/b_i fixed integer polynomials of i."""
    spark = docs.sparkSession
    sh = _shingle_ids(word_shingles(docs, n, text_col, id_col))
    hashes = spark.range(n_hashes).select(
        F.col("id").cast("int").alias("h"),
        ((F.col("id") * 2 + 1) * _HA % _PRIME).alias("a"),
        (F.col("id") * _HB + 7).alias("b"),
    )
    return (
        sh.crossJoin(F.broadcast(hashes))
        .groupBy("doc_id", "h")
        .agg(
            F.min(
                (F.col("a") * F.col("shingle_id") + F.col("b")) % _PRIME
            ).alias("minhash")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become candidate
    pairs → (doc_a, doc_b). The band signature is an ordered concat of the
    band's minhashes; the pair join is on (band, signature) — the classic
    shingle→minhash→band→bucket-join pipeline, no quadratic step."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, n, text_col, id_col).withColumn(
        "band", (F.col("h") / rows_per_band).cast("int")
    )
    band_sig = sig.groupBy("doc_id", "band").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("h"), F.col("minhash")))
                ),
                lambda s: s["minhash"].cast("string"),
            ),
        ).alias("sig")
    )
    a = band_sig.select(
        F.col("doc_id").alias("doc_a"), "band", "sig"
    )
    b = band_sig.select(
        F.col("doc_id").alias("doc_b"), "band", "sig"
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(
    docs: DataFrame,
    bits: int = 64,
    n: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, simhash): tf-weighted SimHash over dictionary-encoded
    term ids; bit j set iff Σ_terms tf·(g(term,j) ? +1 : −1) > 0 with
    g = the xor-shift/MINSTD mix in ``_mix_bit`` — engine-independent."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    ids = (
        tf.select("term")
        .distinct()
        .withColumn(
            "term_id", F.dense_rank().over(Window.orderBy("term")).cast("long")
        )
    )
    tf = tf.join(ids, "term")
    bit_tbl = spark.range(bits).select(F.col("id").cast("int").alias("bit"))
    g = _mix_bit(F.col("term_id"), F.col("bit"))
    signed = F.when(g == 1, F.col("tf")).otherwise(-F.col("tf"))
    per_bit = (
        tf.crossJoin(F.broadcast(bit_tbl))
        .groupBy("doc_id", "bit")
        .agg(F.sum(signed).alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_a, doc_b, hamming ≤ max_hamming) via bit_count(a XOR b).
    Prefilter: pairs must share at least one of 4 hash quadrants (pigeonhole:
    hamming ≤ 3 ⇒ some 16-bit quadrant is identical) — the standard
    SimHash block-permutation trick, keeping the join linear-ish."""
    sh = simhash(docs, bits, 1, text_col, id_col)
    quads = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * q)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("quad"),
    ).select("doc_id", "simhash", F.col("quad.q"), F.col("quad.qv"))
    a = quads.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "q", "qv"
    )
    b = quads.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "q", "qv"
    )
    return (
        a.join(b, ["q", "qv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
