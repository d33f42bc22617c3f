"""The generalized top-k sparse similarity kernel, Spark-first.

The reference implements ONE kernel — ``s_plus`` (similaripy/cython_code/
s_plus.h:265-453: row-parallel Gustavson SpGEMM into a sparse accumulator,
drained through a normalization/shrink/threshold expression into a size-k
heap) — and parameterizes it into nine public similarity functions
(similaripy/similarity.py:9-592). This module does the same with one logical
plan:

    m1(row, j, v1)  ⋈  m2(j, col, v2)        -- hash join on the shared dim
      → groupBy(row, col).sum(v1*v2)          -- Tungsten hash-agg == the SPA
      → join per-row / per-col statistics     -- the precomputed norm vectors
      → scalar similarity expression           -- s_plus.h:129-156, verbatim
      → filter(value >= threshold, value!=0)  -- s_plus.h:205-207 + output
                                                  eliminate_zeros (s_plus.pyx:424)
      → windowed top-k                         -- s_plus.h:39-64 heap

Catalyst supplies what the reference hand-codes: the shuffle replaces the
OpenMP row loop, AQE picks broadcast vs sort-merge joins and splits skewed
partitions (the reference's popularity column-reorder, s_plus_utils.pyx:493-
618, is a cache-locality/skew tactic with no Spark analog needed), and
map-side partial aggregation is the blocked accumulator.

Scale notes (100 TB / 10^12-doc thinking):
* the (row, col) aggregate is the only big shuffle; everything else joins
  small per-key aggregates that AQE broadcast-converts at runtime;
* per-row selector masks (target/filter cols as matrices) are semi/anti
  joins on (row, col) — no driver-side materialization anywhere;
* array-form column selectors become ``isin`` predicates on m2 *before* the
  join, so Catalyst pushes them into the scan (mirrors the reference's
  Python-side pre-filter, s_plus_utils.pyx:424-490).
"""

from __future__ import annotations

from typing import Iterable, Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from similaripy_spark.matrix import binarize, eliminate_zeros, transpose
from similaripy_spark.functions.normalization import normalize as _normalize
from similaripy_spark.operators.topk import top_k

Selector = Union[None, Iterable[int], DataFrame]


def _shrink_values(shrink: float, shrink_type: str) -> tuple[float, float, float]:
    """shrink → (stabilized, bayesian, additive); similarity.py:595-617."""
    if shrink_type == "stabilized":
        return float(shrink), 0.0, 0.0
    if shrink_type == "bayesian":
        return 0.0, float(shrink), 0.0
    if shrink_type == "additive":
        return 0.0, 0.0, float(shrink)
    raise ValueError(
        "shrink_type must be one of 'stabilized', 'bayesian', 'additive'"
    )


def _as_id_df(m1: DataFrame, sel, colname: str) -> DataFrame:
    """Normalize a python iterable / 1-col DataFrame selector to a DataFrame."""
    if isinstance(sel, DataFrame):
        return sel.select(F.col(sel.columns[0]).cast("long").alias(colname)).distinct()
    spark = m1.sparkSession
    vals = [(int(x),) for x in sel]
    return spark.createDataFrame(vals, f"{colname} long").distinct()


def s_plus(
    m1: DataFrame,
    m2: Optional[DataFrame] = None,
    *,
    l1: float = 0.5,
    l2: float = 0.5,
    l3: float = 0.0,
    t1: float = 1.0,
    t2: float = 1.0,
    c1: float = 0.5,
    c2: float = 0.5,
    pop1: Union[str, DataFrame] = "none",
    pop2: Union[str, DataFrame] = "none",
    beta1: float = 0.0,
    beta2: float = 0.0,
    p1: Optional[float] = None,
    p2: Optional[float] = None,
    alpha: float = 1.0,
    k: int = 100,
    shrink: float = 0.0,
    shrink_type: str = "stabilized",
    threshold: float = 0.0,
    binary: bool = False,
    target_rows: Selector = None,
    target_cols: Selector = None,
    filter_cols: Selector = None,
    tie_round: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Generalized similarity (reference: similarity.py:506-592 public API,
    s_plus.h:129-156 formula):

        num   = xy ** alpha                       (only when a denominator exists;
                                                   s_plus.h:131, 142 — with no
                                                   normalization terms the raw xy
                                                   is returned and alpha ignored)
        denom = l1*(t1*(Σx²−xy) + t2*(Σy²−xy) + xy)        # Tversky
              + l2*(Σx²+h_add)^c1 * (Σy²+h_add)^c2          # Cosine
              + l3*Xdepop*Ydepop                             # Depop
              + h_stabilized
        val   = num/denom (0 if denom == 0); bayesian: val *= num/(num+h_bayes)

    ``pop1``/``pop2``: 'none' | 'sum' | DataFrame(id, w) custom weights
    (s_plus_utils.pyx:231-278). Selector semantics per s_plus.pyx:190-196,
    276-295 and s_plus.h:159-188.

    ``max_df``: optional hot-dimension cap — shared dimensions with more
    than max_df m2 entries are dropped from both matrices before anything
    else (approximation knob for skewed data; None = exact).

    Defaults match the reference public API (similarity.py:509-510:
    l1=0.5, l2=0.5 — a blended Tversky+Cosine normalization, NOT raw dot
    products). ``beta1``/``beta2`` are the reference's depop exponents
    (similarity.py:519-520); ``p1``/``p2`` are accepted as aliases (the
    kernel-level names, s_plus.pyx:118-119).

    Returns matrix DataFrame (row, col, value) with per-row top-k.
    """
    if p1 is not None:
        beta1 = p1
    if p2 is not None:
        beta2 = p2
    p1, p2 = float(beta1), float(beta2)
    h_stab, h_bayes, h_add = _shrink_values(shrink, shrink_type)

    m1 = eliminate_zeros(m1.select("row", "col", "value"))
    self_sim = m2 is None
    if not self_sim:
        m2 = eliminate_zeros(m2.select("row", "col", "value"))

    if binary:  # s_plus_utils.pyx:281-308
        m1 = m1.withColumn("value", F.lit(1.0))
        if not self_sim:
            m2 = m2.withColumn("value", F.lit(1.0))

    if max_df is not None:
        # Hot-dimension mitigation: drop shared dimensions whose m2 posting
        # count exceeds max_df from BOTH matrices up front. A hot dimension
        # (stopword column) contributes |postings|² output pairs — an
        # intrinsic blow-up that no shuffle-level skew handling (AQE,
        # salting) can reduce; df-capping is the standard approximation
        # (the Spark-era analog of the reference's popularity machinery,
        # s_plus_utils.pyx:493-618, which reorders hot columns for
        # locality). Semantics: identical to running s_plus on the
        # pre-filtered matrices — norms and populations see the filtered
        # data. The hot set is tiny by construction → broadcast anti-joins.
        hot = (
            (transpose(m1) if self_sim else m2)
            .groupBy("row")
            .agg(F.count("*").alias("_dimdf"))
            .filter(F.col("_dimdf") > int(max_df))
            .select("row")
        )
        m1 = m1.join(
            F.broadcast(hot.select(F.col("row").alias("col"))),
            "col",
            "left_anti",
        )
        if not self_sim:
            m2 = m2.join(F.broadcast(hot), "row", "left_anti")

    # --- row/col statistics BEFORE any selector pruning (the reference
    # builds norm vectors from the full matrices: s_plus.pyx:227-273) ------
    #
    # Round-6 plan shape (optimization guide §2.3/§2.4): every per-row /
    # per-col statistic (squared norms, 'sum' populations) is a WINDOW
    # column computed on the join inputs themselves, not a separate
    # aggregate subtree joined back after the product aggregate:
    #   * the row-keyed window requires hashpartitioning(row), so the
    #     streamed side of the SpGEMM join arrives clustered by `row`; the
    #     (row, col) product aggregate AND the final top-k window then both
    #     satisfy their distribution from that same single exchange — the
    #     pair stream (quadratic in posting lengths, the only truly large
    #     relation here) never crosses a shuffle while m2 rides in as a
    #     broadcast, and a hot shared dimension is spread across row
    #     partitions instead of landing in one (skew-immune by layout);
    #   * self-similarity derives BOTH join sides from one stats-annotated
    #     base plan (ysq(m1ᵀ) ≡ xsq(m1)), so the scan + stats exchange run
    #     once (AQE reuses the shuffle stage for the broadcast side);
    #   * statistics ride through the product aggregate via max(): every
    #     contribution to an output cell shares the same row (resp. col),
    #     so max() reproduces the exact per-key value — no float change.
    need_sq = l1 != 0.0 or l2 != 0.0
    row_w = Window.partitionBy("row")
    v = F.col("value")

    # The row clustering is installed with an EXPLICIT partition count (the
    # session's configured shuffle parallelism — the standard deployment-
    # sized knob): an ENSURE_REQUIREMENTS exchange here would be AQE-
    # coalesced by its own (small, pre-join) byte size, and the downstream
    # SpGEMM multiplies volume by the posting-length factor — a Zipf corpus
    # measured 14 s → 98 s when the pair stream aggregated+sorted in the
    # handful of partitions AQE sized for the pre-join bytes. Partition
    # count must be sized for the POST-join volume, which only the
    # configured parallelism knows about (guide §2.5 input-skew note).
    n_part = int(
        m1.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )

    if l3 != 0.0:  # s_plus_utils.pyx:231-278
        if not isinstance(pop1, DataFrame) and pop1 not in ("none", "sum"):
            raise ValueError(f"invalid pop1: {pop1!r}")
        if not isinstance(pop2, DataFrame) and pop2 not in ("none", "sum"):
            raise ValueError(f"invalid pop2: {pop2!r}")
    need_xdep = l3 != 0.0 and (isinstance(pop1, DataFrame) or pop1 == "sum")
    need_ydep = l3 != 0.0 and (isinstance(pop2, DataFrame) or pop2 == "sum")

    def _pop_df(pop, key: str, expo: float, out: str) -> DataFrame:
        return pop.select(
            F.col(pop.columns[0]).cast("long").alias(key),
            F.pow(F.col(pop.columns[1]).cast("double"), F.lit(expo)).alias(out),
        )

    left_stats: list[str] = []
    right_stats: list[str] = []
    if self_sim:
        # ONE shared base: xsq ≡ ysq and the row-sum population serves both
        # exponents; the transposed side is a pure projection of this plan.
        base = m1.repartition(n_part, F.col("row"))
        if need_sq:
            base = base.withColumn("_nsq", F.sum(v * v).over(row_w))
        sum_xdep = need_xdep and not isinstance(pop1, DataFrame)
        sum_ydep = need_ydep and not isinstance(pop2, DataFrame)
        if sum_xdep or sum_ydep:
            base = base.withColumn("_rsum", F.sum(v).over(row_w))
        left = base
        if need_sq:
            left = left.withColumn("_xsq", F.col("_nsq"))
            left_stats.append("_xsq")
        if sum_xdep:
            left = left.withColumn("_xdep", F.pow(F.col("_rsum"), F.lit(p1)))
            left_stats.append("_xdep")
        # the transposed side: a pure projection of the SAME base plan
        # (stats transpose with it: ysq ≡ nsq and the m2-col population is
        # keyed by base.row, both already in hand)
        tsel = [
            F.col("col").alias("row"),
            F.col("row").alias("col"),
            F.col("value"),
        ]
        if need_sq:
            tsel.append(F.col("_nsq").alias("_ysq"))
            right_stats.append("_ysq")
        if sum_ydep:
            tsel.append(F.pow(F.col("_rsum"), F.lit(p2)).alias("_ydep"))
            right_stats.append("_ydep")
        right = base.select(*tsel)
    else:
        left, right = m1.repartition(n_part, F.col("row")), m2
        if need_sq:
            left = left.withColumn("_xsq", F.sum(v * v).over(row_w))
            right = right.withColumn(
                "_ysq", F.sum(v * v).over(Window.partitionBy("col"))
            )
            left_stats.append("_xsq")
            right_stats.append("_ysq")
        if need_xdep and not isinstance(pop1, DataFrame):  # 'sum'
            left = left.withColumn(
                "_xdep", F.pow(F.sum(v).over(row_w), F.lit(p1))
            )
            left_stats.append("_xdep")
        if need_ydep and not isinstance(pop2, DataFrame):  # 'sum'
            right = right.withColumn(
                "_ydep",
                F.pow(F.sum(v).over(Window.partitionBy("col")), F.lit(p2)),
            )
            right_stats.append("_ydep")

    # --- selector pruning (pushed before the join wherever the reference
    # pre-filters in Python: s_plus.pyx:190-196, 287-295); row/col pruning
    # sits ABOVE the stats windows, so norms still see the full matrices --
    if target_rows is not None:
        tr = _as_id_df(m1, target_rows, "row")
        left = left.join(F.broadcast(tr), "row", "left_semi")

    tc_matrix = fc_matrix = None
    if target_cols is not None:
        if isinstance(target_cols, DataFrame) and len(target_cols.columns) >= 2:
            tc_matrix = target_cols.select(
                F.col(target_cols.columns[0]).cast("long").alias("row"),
                F.col(target_cols.columns[1]).cast("long").alias("col"),
            )
        else:
            tc = _as_id_df(m1, target_cols, "col")
            right = right.join(F.broadcast(tc), "col", "left_semi")
    if filter_cols is not None:
        if isinstance(filter_cols, DataFrame) and len(filter_cols.columns) >= 2:
            fc_matrix = filter_cols.select(
                F.col(filter_cols.columns[0]).cast("long").alias("row"),
                F.col(filter_cols.columns[1]).cast("long").alias("col"),
            )
        else:
            fc = _as_id_df(m1, filter_cols, "col")
            right = right.join(F.broadcast(fc), "col", "left_anti")

    # --- the SpGEMM: join on the shared dimension + hash aggregate --------
    jl = left.select(
        F.col("row"), F.col("col").alias("_j"), F.col("value").alias("_v1"),
        *left_stats,
    )
    jr = right.select(
        F.col("row").alias("_j"), F.col("col"), F.col("value").alias("_v2"),
        *right_stats,
    )
    carried = left_stats + right_stats
    xy = (
        jl.join(jr, "_j")
        .groupBy("row", "col")
        .agg(
            F.sum(F.col("_v1") * F.col("_v2")).alias("_xy"),
            *[F.max(c).alias(c) for c in carried],
        )
    )

    # per-row (row,col) masks apply on output cells before top-k
    # (s_plus.h:159-188 binary-searches the mask per candidate)
    if tc_matrix is not None:
        xy = xy.join(tc_matrix, ["row", "col"], "left_semi")
    if fc_matrix is not None:
        xy = xy.join(fc_matrix, ["row", "col"], "left_anti")

    # DataFrame-form populations attach here, after the aggregate: they are
    # per-key relations the planner broadcast-joins against the (already
    # top-k-bound-free but much thinner than the join output) cell stream —
    # attaching them to the join inputs instead was measured SLOWER because
    # it forces extra exchanges below the broadcast build (round 6).
    scored = xy
    if need_xdep and isinstance(pop1, DataFrame):
        scored = scored.join(_pop_df(pop1, "row", p1, "_xdep"), "row")
    if need_ydep and isinstance(pop2, DataFrame):
        scored = scored.join(_pop_df(pop2, "col", p2, "_ydep"), "col")
    xdepop = "_xdep" if need_xdep else None
    ydepop = "_ydep" if need_ydep else None

    # --- the similarity expression (s_plus.h:129-156) ---------------------
    xy_c = F.col("_xy")
    num = F.pow(xy_c, F.lit(alpha)) if alpha != 1.0 else xy_c
    terms = []
    if l1 != 0.0:
        terms.append(
            F.lit(l1)
            * (
                F.lit(t1) * (F.col("_xsq") - xy_c)
                + F.lit(t2) * (F.col("_ysq") - xy_c)
                + xy_c
            )
        )
    if l2 != 0.0:
        terms.append(
            F.lit(l2)
            * F.pow(F.col("_xsq") + F.lit(h_add), F.lit(c1))
            * F.pow(F.col("_ysq") + F.lit(h_add), F.lit(c2))
        )
    if l3 != 0.0:
        xd = F.col("_xdep") if xdepop is not None else F.lit(1.0)
        yd = F.col("_ydep") if ydepop is not None else F.lit(1.0)
        terms.append(F.lit(l3) * xd * yd)

    if terms or h_stab != 0.0 or h_bayes != 0.0:
        denom = F.lit(h_stab)
        for t in terms:
            denom = denom + t
        val = F.when(denom != 0.0, num / denom).otherwise(F.lit(0.0))
        if h_bayes != 0.0:
            val = val * (num / (num + F.lit(h_bayes)))
    else:
        # no normalization at all → raw xy, alpha ignored (s_plus.h:131, 142-156)
        val = xy_c

    scored = scored.select("row", "col", val.alias("value"))

    # threshold (s_plus.h:205-207) then drop exact zeros (s_plus.pyx:424)
    scored = scored.filter(
        (F.col("value") >= F.lit(float(threshold))) & (F.col("value") != 0.0)
    )

    return top_k(scored, k, tie_round=tie_round)


# ---------------------------------------------------------------------------
# The nine public similarity functions = s_plus parameterizations, matching
# similarity.py:9-592 wrapper-for-wrapper.
# ---------------------------------------------------------------------------

_COMMON_DOC = dict()


def dot_product(m1, m2=None, *, k=100, shrink=0.0, shrink_type="stabilized",
                threshold=0.0, binary=False, target_rows=None,
                target_cols=None, filter_cols=None, max_df=None) -> DataFrame:
    """Raw inner products + top-k (similarity.py:9-64: all l's zero)."""
    return s_plus(m1, m2, l1=0.0, l2=0.0, k=k, shrink=shrink, shrink_type=shrink_type,
                  threshold=threshold, binary=binary, target_rows=target_rows,
                  target_cols=target_cols, filter_cols=filter_cols,
                  max_df=max_df)


def cosine(m1, m2=None, *, k=100, shrink=0.0, shrink_type="stabilized",
           threshold=0.0, binary=False, target_rows=None,
           target_cols=None, filter_cols=None, max_df=None) -> DataFrame:
    """dot/(‖x‖·‖y‖+h) (similarity.py:67-123: l2=1, c1=c2=0.5)."""
    return s_plus(m1, m2, l1=0.0, l2=1.0, c1=0.5, c2=0.5, k=k, shrink=shrink,
                  shrink_type=shrink_type, threshold=threshold, binary=binary,
                  target_rows=target_rows, target_cols=target_cols,
                  filter_cols=filter_cols, max_df=max_df)


def asymmetric_cosine(m1, m2=None, *, alpha=0.5, k=100, shrink=0.0,
                      shrink_type="stabilized", threshold=0.0, binary=False,
                      target_rows=None, target_cols=None,
                      filter_cols=None) -> DataFrame:
    """dot/((Σx²)^α (Σy²)^(1−α)) (similarity.py:126-186: c1=α, c2=1−α)."""
    return s_plus(m1, m2, l1=0.0, l2=1.0, c1=float(alpha), c2=1.0 - float(alpha), k=k,
                  shrink=shrink, shrink_type=shrink_type, threshold=threshold,
                  binary=binary, target_rows=target_rows,
                  target_cols=target_cols, filter_cols=filter_cols)


def tversky(m1, m2=None, *, alpha=1.0, beta=1.0, k=100, shrink=0.0,
            shrink_type="stabilized", threshold=0.0, binary=False,
            target_rows=None, target_cols=None, filter_cols=None) -> DataFrame:
    """Tversky index on squared-norm masses (similarity.py:189-249: l1=1,
    t1=α, t2=β)."""
    return s_plus(m1, m2, l1=1.0, l2=0.0, t1=float(alpha), t2=float(beta), k=k,
                  shrink=shrink, shrink_type=shrink_type, threshold=threshold,
                  binary=binary, target_rows=target_rows,
                  target_cols=target_cols, filter_cols=filter_cols)


def jaccard(m1, m2=None, *, k=100, shrink=0.0, shrink_type="stabilized",
            threshold=0.0, binary=False, target_rows=None,
            target_cols=None, filter_cols=None) -> DataFrame:
    """Jaccard = Tversky(1, 1) (similarity.py:252-308)."""
    return tversky(m1, m2, alpha=1.0, beta=1.0, k=k, shrink=shrink,
                   shrink_type=shrink_type, threshold=threshold, binary=binary,
                   target_rows=target_rows, target_cols=target_cols,
                   filter_cols=filter_cols)


def dice(m1, m2=None, *, k=100, shrink=0.0, shrink_type="stabilized",
         threshold=0.0, binary=False, target_rows=None,
         target_cols=None, filter_cols=None) -> DataFrame:
    """Dice = Tversky(0.5, 0.5) (similarity.py:311-367)."""
    return tversky(m1, m2, alpha=0.5, beta=0.5, k=k, shrink=shrink,
                   shrink_type=shrink_type, threshold=threshold, binary=binary,
                   target_rows=target_rows, target_cols=target_cols,
                   filter_cols=filter_cols)


def _l1_pow(m: DataFrame, alpha: float) -> DataFrame:
    """L1-normalize rows then raise to α (similarity.py:410-415)."""
    out = _normalize(m, norm="l1", axis=1)
    if alpha != 1.0:
        out = out.withColumn("value", F.pow(F.col("value"), F.lit(float(alpha))))
    return out


def p3alpha(m1, m2=None, *, alpha=1.0, k=100, shrink=0.0,
            shrink_type="stabilized", threshold=0.0, binary=False,
            target_rows=None, target_cols=None, filter_cols=None,
            tie_round=None) -> DataFrame:
    """3-step random-walk similarity (similarity.py:370-432): L1-normalize the
    rows of both matrices, raise to α, then plain top-k product. NOTE the
    reference passes ``binary`` through to the kernel, i.e. binarization is
    applied AFTER the L1 normalization (similarity.py:416-431) — preserved."""
    m1 = eliminate_zeros(m1.select("row", "col", "value"))
    # pin the row clustering BELOW the normalization window with an
    # explicit partition count: the window's own ENSURE_REQUIREMENTS
    # exchange would be AQE-coalesced by its (small, pre-join) byte size,
    # and everything downstream — the SpGEMM join probe, the product
    # aggregate, the top-k window — inherits that partitioning (the
    # kernel's later repartition elides as redundant). Same reasoning as
    # the kernel-internal pin; see s_plus.
    m1 = m1.repartition(
        int(m1.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
        F.col("row"),
    )
    m2 = transpose(m1) if m2 is None else eliminate_zeros(
        m2.select("row", "col", "value"))
    m1n = _l1_pow(m1, alpha)
    m2n = _l1_pow(m2, alpha)
    return s_plus(m1n, m2n, l1=0.0, l2=0.0, k=k, shrink=shrink, shrink_type=shrink_type,
                  threshold=threshold, binary=binary, target_rows=target_rows,
                  target_cols=target_cols, filter_cols=filter_cols,
                  tie_round=tie_round)


def rp3beta(m1, m2=None, *, alpha=1.0, beta=1.0, k=100, shrink=0.0,
            shrink_type="stabilized", threshold=0.0, binary=False,
            target_rows=None, target_cols=None, filter_cols=None,
            tie_round=None) -> DataFrame:
    """P3α divided by column popularity^β (similarity.py:435-503).

    Popularity = column sums of m2 BEFORE L1 normalization
    (similarity.py:479), applied through the depop term with l3=1, p2=β.
    As in p3alpha, ``binary`` is passed through to the kernel (applied after
    normalization), matching similarity.py:483-502.
    """
    m1 = eliminate_zeros(m1.select("row", "col", "value"))
    # same pinned pre-normalization row clustering as p3alpha (the pop
    # aggregate, keyed by m2.col ≡ m1.row, rides the same exchange too)
    m1 = m1.repartition(
        int(m1.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
        F.col("row"),
    )
    m2 = transpose(m1) if m2 is None else eliminate_zeros(
        m2.select("row", "col", "value"))
    pop_m2 = m2.groupBy("col").agg(F.sum("value").alias("w"))
    m1n = _l1_pow(m1, alpha)
    m2n = _l1_pow(m2, alpha)
    return s_plus(m1n, m2n, l1=0.0, l2=0.0, l3=1.0, pop1="none", pop2=pop_m2, beta2=float(beta),
                  k=k, shrink=shrink, shrink_type=shrink_type,
                  threshold=threshold, binary=binary, target_rows=target_rows,
                  target_cols=target_cols, filter_cols=filter_cols,
                  tie_round=tie_round)
