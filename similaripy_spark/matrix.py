"""Long-form sparse-matrix helpers.

A "matrix" in this engine is any DataFrame with columns
``(row: long, col: long, value: double)`` — the relational (COO) encoding of
the reference's scipy CSR/COO arrays (reference: similaripy/cython_code/
utils.pyx:43-173 builds exactly these triples). Absence of a (row, col) pair
encodes a zero; explicit zeros are dropped before compute, matching the
reference's ``eliminate_zeros`` (s_plus.pyx:208-211) which is semantic, not
cosmetic (binary/Tversky masses must not count stored zeros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MATRIX_COLS = ("row", "col", "value")


def as_matrix(df: DataFrame, row="row", col="col", value="value") -> DataFrame:
    """Project/rename an arbitrary DataFrame into canonical matrix form."""
    return df.select(
        F.col(row).cast("long").alias("row"),
        F.col(col).cast("long").alias("col"),
        F.col(value).cast("double").alias("value"),
    )


def eliminate_zeros(m: DataFrame) -> DataFrame:
    """Drop explicitly-stored zeros (reference: s_plus.pyx:208-211)."""
    return m.filter(F.col("value") != 0.0)


def transpose(m: DataFrame) -> DataFrame:
    """Swap row/col — free in relational form (reference transposes CSR)."""
    return m.select(
        F.col("col").alias("row"), F.col("row").alias("col"), F.col("value")
    )


def binarize(m: DataFrame) -> DataFrame:
    """Replace every stored (nonzero) value with 1.0
    (reference: s_plus_utils.pyx:281-308 after eliminate_zeros)."""
    return eliminate_zeros(m).withColumn("value", F.lit(1.0))


def from_coo(
    spark: SparkSession, rows, cols, values, chunk: int = 1 << 20
) -> DataFrame:
    """Create a matrix DataFrame from parallel COO arrays (test/fixture path)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "row": pd.Series(rows, dtype="int64"),
            "col": pd.Series(cols, dtype="int64"),
            "value": pd.Series(values, dtype="float64"),
        }
    )
    return spark.createDataFrame(pdf)
