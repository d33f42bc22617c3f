"""Deterministic per-group top-k.

The reference keeps a size-k min-heap per output row with strict ``score >
root`` replacement and unspecified output order (s_plus.h:39-64, 443-450); its
tests therefore only compare order-insensitive checksums. This engine defines
top-k deterministically as ``ORDER BY value DESC, col ASC`` (SURVEY.md §2.5),
which agrees with the reference on every row whose k-boundary scores are
distinct.

Spark ≥3.5 rewrites ``row_number() OVER (PARTITION BY ...) <= k`` into a
``WindowGroupLimit`` — a per-partition top-k pushed below the shuffle — which
is the distributed equivalent of the reference's per-row heap (verified via
``.explain("formatted")``: WindowGroupLimit appears on both map and reduce
side of the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    k: int,
    group: str = "row",
    order_value: str = "value",
    tiebreak: str = "col",
    keep_rank: bool = False,
    tie_round: int | None = None,
) -> DataFrame:
    """Keep the k largest ``order_value`` rows per ``group``.

    ``tie_round``: quantize the ordering key to 10^-r via
    ``floor(v*10^r + 0.5)`` before comparing. Scores that are equal up to
    accumulated float noise (different summation orders) then sort as exact
    ties and fall to the deterministic ``tiebreak`` — needed when the same
    selection must reproduce bit-for-bit across engines/runs on
    non-integer-valued inputs.
    """
    if tie_round is not None:
        key = F.floor(F.col(order_value) * float(10**tie_round) + 0.5)
    else:
        key = F.col(order_value)
    w = Window.partitionBy(group).orderBy(key.desc(), F.col(tiebreak).asc())
    out = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return out if keep_rank else out.drop("rank")
