"""Matrix normalizations as Catalyst column expressions.

Reproduces the semantics of the reference's Cython kernels
(similaripy/cython_code/normalization.pyx) on long-form matrices
``(row, col, value)``:

* ``normalize``  — l1 / l2 / max row- or column-scaling
  (normalization.pyx:97-197)
* ``tfidf``      — TF·IDF with pluggable tf/idf modes (normalization.pyx:200-257)
* ``bm25``       — Okapi BM25, the delta=0 path of bm25plus
  (normalization.py:116-149)
* ``bm25plus``   — BM25+ (Lv & Zhai) (normalization.pyx:260-334)

Everything is built-in ``pyspark.sql.functions`` — no UDFs — so the whole
weighting pass stays inside whole-stage codegen. Per-TERM statistics are
``groupBy`` aggregates joined back to the cells (map-side partial combine +
AQE-convertible, skew-splittable joins — a window partitioned by the term
key would put a stopword's whole posting list in one task); per-DOC
statistics use a window in the default orientation (row groups are
document-length-bounded — skew-safe and one exchange cheaper) and the
aggregate+join shape when the doc key is a column (axis=0); global scalars
(N, avgdl) ride in via a broadcast cross-join of a 1-row aggregate, keeping
the plan fully lazy.

Semantics preserved exactly (see tests/oracle_numpy.py for the literal
transcription used as the test oracle):

* ``doc_len`` is the sum of **values**, not the nnz count
  (normalization.pyx:311-312);
* ``df`` counts strictly-positive entries only (normalization.pyx:313-314);
* ``avgdl`` divides by the declared row count (matrix shape), which includes
  empty rows (normalization.pyx:315, 323) — pass ``n_rows`` to reproduce a
  shape with empty rows, else the distinct row count present is used;
* IDF is **not clamped** — negative for df > N/2 (normalization.pyx:93-94);
* l2/l1 rows with zero norm and max-rows with max <= 0 are left unscaled
  (normalization.pyx:119-128, 152-161, 188-197).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TF_MODES = ("binary", "raw", "sqrt", "freq", "log")
IDF_MODES = ("unary", "base", "smooth", "prob", "bm25")


def tf_expr(freq: Column, doc_len: Column, mode: str, logbase: float) -> Column:
    """TF dispatch (normalization.pyx:47-69)."""
    if mode == "binary":
        return F.when(freq != 0, F.lit(1.0)).otherwise(F.lit(0.0))
    if mode == "raw":
        return freq
    if mode == "sqrt":
        return F.sqrt(freq)
    if mode == "freq":
        return freq / doc_len
    if mode == "log":
        return F.log(F.lit(1.0) + freq) / math.log(logbase)
    raise ValueError(f"Unknown tf_mode {mode!r}. Expected one of {TF_MODES}")


def idf_expr(df_count: Column, n_docs: Column, mode: str, logbase: float) -> Column:
    """IDF dispatch (normalization.pyx:72-94). Callers must guard df_count=0
    (possible when every stored value of a term is <= 0): the kernel's
    ``idf_[i] != 0`` check (normalization.pyx:317-319) leaves idf at 0 there,
    so weights become 0 instead of NULL/inf — see ``_guarded_idf``."""
    log_logbase = math.log(logbase)
    if mode == "unary":
        return F.lit(1.0)
    if mode == "base":
        return F.log(n_docs / df_count) / log_logbase
    if mode == "smooth":
        return F.log(n_docs / (F.lit(1.0) + df_count)) / log_logbase
    if mode == "prob":
        return F.log((n_docs - df_count) / df_count) / log_logbase
    if mode == "bm25":
        return F.log((n_docs - df_count + 0.5) / (df_count + 0.5)) / log_logbase
    raise ValueError(f"Unknown idf_mode {mode!r}. Expected one of {IDF_MODES}")


def _axis_cols(axis: int) -> tuple[str, str]:
    """(group_key, other_key): axis=1 scales along rows (the default),
    axis=0 along columns — the reference transposes instead
    (normalization.py:59-73); in long form we just switch the grouping key."""
    if axis == 1:
        return "row", "col"
    if axis == 0:
        return "col", "row"
    raise ValueError(f"axis must be 0 or 1, got {axis}")


def normalize(m: DataFrame, norm: str = "l2", axis: int = 1) -> DataFrame:
    """l1/l2/max scaling (normalization.pyx:97-197).

    Groups with zero (l1/l2) or non-positive (max) norms are left unscaled,
    matching the kernels' skip rules.

    Physical strategy by axis: row groups (axis=1) are document-length-
    bounded, so a single window shuffle is both skew-safe and one exchange
    cheaper; column groups (axis=0) can be corpus-sized (a stopword
    column), so the norm is a ``groupBy`` aggregate (map-side partial
    combine shrinks the hot group before the shuffle) joined back with AQE
    skew handling.
    """
    key, _ = _axis_cols(axis)
    v = F.col("value")
    post = lambda n: n  # applied OUTSIDE the aggregate/window
    if norm == "l1":
        agg = F.sum(F.abs(v))
    elif norm == "l2":
        agg = F.sum(v * v)
        post = F.sqrt
    elif norm == "max":
        agg = F.max(v)
    else:
        raise ValueError(f"norm must be l1|l2|max, got {norm!r}")
    if norm == "max":
        guard_of = lambda n: n > 0.0
    else:
        guard_of = lambda n: n != 0.0
    if axis == 1:
        denom = post(agg.over(Window.partitionBy(key)))
        return m.withColumn(
            "value", F.when(guard_of(denom), v / denom).otherwise(v)
        )
    norms = m.groupBy(key).agg(post(agg).alias("_norm"))
    scaled = F.when(guard_of(F.col("_norm")), v / F.col("_norm")).otherwise(v)
    return m.join(norms, key).withColumn("value", scaled).select(*m.columns)


def _with_doc_term_stats(m: DataFrame, axis: int, n_rows: int | None):
    """Attach per-doc (doc_len) and per-term (df) stats plus global scalars
    (n_docs, avgdl) to every cell.

    Term stats (``_df``) are a ``groupBy`` aggregate joined back
    (partial/map-side combine + AQE-convertible, skew-splittable join), NOT
    a window: a window partitioned by the term key puts a stopword's entire
    posting list in one task and is excluded from AQE skew splitting — the
    aggregate+join shape (the same one the fulltext path uses,
    fulltext/weights.py) gets both map-side combine and runtime skew
    handling. The join is left unhinted so AQE broadcast-converts it when
    the vocabulary is small (web-scale vocabularies don't fit a broadcast).

    Doc stats (``_dl``) use a window for the default orientation (axis=1):
    row groups are document-length-bounded so the window is skew-safe and
    one exchange cheaper; for axis=0 the "doc" key is a column — corpus-
    sized groups — so the aggregate+join shape is used there too."""
    doc_key, term_key = _axis_cols(axis)
    v = F.col("value")

    term_stats = (
        m.filter(v > 0)  # normalization.pyx:313-314: strictly positive only
        .groupBy(term_key)
        .agg(F.count("*").alias("_df"))
    )

    # Global scalars: total value mass and doc count. The reference divides by
    # the declared shape (incl. empty rows); if n_rows is given, use it.
    if n_rows is not None:
        totals = m.agg(F.sum("value").alias("_total_mass")).withColumn(
            "_n_docs", F.lit(float(n_rows))
        )
    else:
        totals = m.agg(
            F.sum("value").alias("_total_mass"),
            F.countDistinct(doc_key).cast("double").alias("_n_docs"),
        )
    if axis == 1:
        cells = m.withColumn(
            "_dl", F.sum(v).over(Window.partitionBy(doc_key))
        )  # normalization.pyx:311-312: sum of values
    else:
        doc_stats = m.groupBy(doc_key).agg(F.sum(v).alias("_dl"))
        cells = m.join(doc_stats, doc_key)
    cells = (
        cells
        # left join + coalesce: a term whose values are all <= 0 has no
        # term_stats row; the kernel keeps df=0 for it (normalization.pyx:313)
        .join(term_stats, term_key, "left")
        .withColumn("_df", F.coalesce(F.col("_df"), F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .withColumn("_avgdl", F.col("_total_mass") / F.col("_n_docs"))
    )
    return cells


def _guarded_idf(idf_: Column) -> Column:
    """Reproduce the kernel's df=0 short-circuit (normalization.pyx:317-319):
    terms with no strictly-positive entry keep idf=0 (⇒ weight 0), instead
    of NULL/±inf from log(N/0)."""
    return F.when(F.col("_df") > 0, idf_).otherwise(F.lit(0.0))


_STAT_COLS = ("_dl", "_df", "_total_mass", "_n_docs", "_avgdl")


def tfidf(
    m: DataFrame,
    axis: int = 1,
    logbase: float = math.e,
    tf_mode: str = "sqrt",
    idf_mode: str = "smooth",
    n_rows: int | None = None,
) -> DataFrame:
    """TF-IDF weighting (normalization.pyx:200-257; defaults from
    normalization.py:190-218)."""
    cells = _with_doc_term_stats(m, axis, n_rows)
    tf_ = tf_expr(F.col("value"), F.col("_dl"), tf_mode, logbase)
    idf_ = _guarded_idf(idf_expr(F.col("_df"), F.col("_n_docs"), idf_mode, logbase))
    return cells.withColumn("value", tf_ * idf_).drop(*_STAT_COLS)


def bm25plus(
    m: DataFrame,
    axis: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 1.0,
    tf_mode: str = "raw",
    idf_mode: str = "bm25",
    logbase: float = math.e,
    n_rows: int | None = None,
) -> DataFrame:
    """BM25+ weighting (normalization.pyx:260-334):

    ``weight = idf * (tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl)) + delta)``
    """
    cells = _with_doc_term_stats(m, axis, n_rows)
    tf_ = tf_expr(F.col("value"), F.col("_dl"), tf_mode, logbase)
    idf_ = _guarded_idf(idf_expr(F.col("_df"), F.col("_n_docs"), idf_mode, logbase))
    norm_dl = (1.0 - b) + b * F.col("_dl") / F.col("_avgdl")  # pyx:326-327
    weight = idf_ * (tf_ * (k1 + 1.0) / (tf_ + k1 * norm_dl) + delta)
    return cells.withColumn("value", weight).drop(*_STAT_COLS)


def bm25(
    m: DataFrame,
    axis: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    tf_mode: str = "raw",
    idf_mode: str = "bm25",
    logbase: float = math.e,
    n_rows: int | None = None,
) -> DataFrame:
    """Okapi BM25 = BM25+ with delta=0 (normalization.py:116-149)."""
    return bm25plus(
        m,
        axis=axis,
        k1=k1,
        b=b,
        delta=0.0,
        tf_mode=tf_mode,
        idf_mode=idf_mode,
        logbase=logbase,
        n_rows=n_rows,
    )
