"""Shared pytest fixtures: one session-scoped SparkSession + seeded random
long-form matrices mirroring the reference's test generators
(tests/test_similarity.py:284-298, test_normalization.py:7-9: everything from
``np.random.default_rng(42)``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from similaripy_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="similaripy_spark_tests",
        parallelism=4,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


def make_dense_sparse(rng, n_rows, n_cols, density, integer=False):
    """Dense float array with ~density nnz at unique positions, values in
    (0, 1) — the same distributional shape the reference tests use."""
    nnz = int(n_rows * n_cols * density)
    flat = rng.choice(n_rows * n_cols, size=nnz, replace=False)
    vals = rng.random(nnz).astype(np.float32).astype(np.float64)
    if integer:
        vals = np.ceil(vals * 10.0)
    X = np.zeros((n_rows, n_cols))
    X[flat // n_cols, flat % n_cols] = vals
    return X


def to_matrix_df(spark, X):
    """Dense array → long-form (row, col, value) DataFrame."""
    r, c = np.nonzero(X)
    pdf = pd.DataFrame(
        {"row": r.astype("int64"), "col": c.astype("int64"), "value": X[r, c]}
    )
    return spark.createDataFrame(pdf)


def collect_matrix(df):
    """Long-form DataFrame → {row: [(col, value), ...]} sorted (-value, col)."""
    rows = df.collect()
    out: dict[int, list[tuple[int, float]]] = {}
    for rec in rows:
        out.setdefault(rec["row"], []).append((rec["col"], rec["value"]))
    for r in out:
        out[r].sort(key=lambda t: (-t[1], t[0]))
    return out


def assert_topk_equal(engine: dict, oracle: dict, rtol=1e-4, atol=1e-8):
    """Reference-style tolerant comparison (tests/test_similarity.py:8-29
    compares order-insensitive checksums at rtol 1e-4): same rows, same entry
    counts, matching scores on shared cols; cols present on only one side must
    sit at the k-boundary score (tie)."""
    assert set(engine) == set(oracle), (
        f"row sets differ: extra={set(engine) - set(oracle)} "
        f"missing={set(oracle) - set(engine)}"
    )
    for r in oracle:
        e, o = dict(engine[r]), dict(oracle[r])
        assert len(e) == len(o), f"row {r}: {len(e)} entries vs oracle {len(o)}"
        boundary = min(v for _, v in oracle[r])
        for c, ov in o.items():
            if c in e:
                np.testing.assert_allclose(e[c], ov, rtol=rtol, atol=atol,
                                           err_msg=f"row {r} col {c}")
            else:
                np.testing.assert_allclose(ov, boundary, rtol=rtol, atol=atol,
                                           err_msg=f"row {r}: missing col {c} "
                                                   "not at tie boundary")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def m_topk(rng):
    """Mirrors reference test_similarity.py:289-298 (smaller for CI speed)."""
    return make_dense_sparse(np.random.default_rng(42), 300, 240, 0.03)


@pytest.fixture(scope="session")
def m_full(rng):
    """k = n_cols full-row comparison (test_similarity.py:303-314)."""
    return make_dense_sparse(np.random.default_rng(43), 120, 40, 0.05)


@pytest.fixture(scope="session")
def m_norm():
    """Normalization oracle input (test_normalization.py:52-53, 72-73),
    integer counts as a tokenizer would produce."""
    return make_dense_sparse(np.random.default_rng(44), 80, 50, 0.06, integer=True)
