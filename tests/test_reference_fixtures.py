"""Rank-identity on the reference's literal pytest query set.

Reproduces reference tests/test_similarity.py:289-314 (all nine similarity
functions at their tested parameters, k=50 top-k and full-row variants) and
tests/test_normalization.py:12-96 (l1/l2/max/tfidf/bm25) on the replayed
``default_rng(42)`` fixture matrices (tests/reference_fixtures.py), with the
reference's own comparison contract: per-row top-k SET equality + score
rtol 1e-4 (its check_sum/check_full tolerances), via the NumPy oracle that
transcribes the kernel formulas line-by-line (tests/oracle_numpy.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import similaripy_spark as sps
from tests import oracle_numpy as O
from tests.conftest import assert_topk_equal, collect_matrix, to_matrix_df
from tests.reference_fixtures import REFERENCE_SHAPES, fixture_frame

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_dense(name: str) -> np.ndarray:
    n_rows, n_cols, _ = REFERENCE_SHAPES[name]
    pdf = pd.read_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
    X = np.zeros((n_rows, n_cols))
    X[pdf["row"], pdf["col"]] = pdf["value"]
    return X


@pytest.mark.parametrize("name", sorted(REFERENCE_SHAPES))
def test_committed_fixtures_regenerate_exactly(name):
    """The committed parquet is bit-identical to a fresh replay — the
    fixture is a pure function of (seed, shape, density)."""
    committed = pd.read_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
    fresh = fixture_frame(name)
    pd.testing.assert_frame_equal(committed, fresh)


# (function, kwargs, oracle kwargs) — the reference's literal parameter set,
# tests/test_similarity.py:236-246
REF_PARAMS = [
    ("dot_product", {}, dict()),
    ("cosine", {}, dict(l2=1.0)),
    ("asymmetric_cosine", dict(alpha=0.2), dict(l2=1.0, c1=0.2, c2=0.8)),
    ("jaccard", {}, dict(l1=1.0)),
    ("dice", {}, dict(l1=1.0, t1=0.5, t2=0.5)),
    ("tversky", dict(alpha=0.8, beta=0.4), dict(l1=1.0, t1=0.8, t2=0.4)),
]


@pytest.fixture(scope="module")
def topk_matrix(spark):
    X = _load_dense("sim_topk")
    return X, to_matrix_df(spark, X).cache()


@pytest.fixture(scope="module")
def full_matrix(spark):
    X = _load_dense("sim_full")
    return X, to_matrix_df(spark, X).cache()


@pytest.mark.parametrize("fn_name,kw,okw", REF_PARAMS)
def test_reference_topk_set(spark, topk_matrix, fn_name, kw, okw):
    """test_similarity_topk: 1000x800 d=0.025 k=50."""
    X, m = topk_matrix
    got = collect_matrix(getattr(sps, fn_name)(m, k=50, **kw))
    exp = O.topk_np(O.s_plus_np(X, X.T, **okw), 50)
    assert_topk_equal(got, exp, rtol=1e-4)


@pytest.mark.parametrize("fn_name,kw,okw", REF_PARAMS)
def test_reference_full_rows(spark, full_matrix, fn_name, kw, okw):
    """test_similarity_full: 400x50 d=0.025, k=n_cols (every surviving
    cell compared)."""
    X, m = full_matrix
    got = collect_matrix(getattr(sps, fn_name)(m, k=50, **kw))
    exp = O.topk_np(O.s_plus_np(X, X.T, **okw), 50)
    assert_topk_equal(got, exp, rtol=1e-4)


def _l1_pow(X: np.ndarray, alpha: float) -> np.ndarray:
    out = O.norm_scale(X, "l1", 1) ** alpha
    out[X == 0] = 0
    return out


def test_reference_p3alpha_rp3beta_splus(spark, topk_matrix):
    """The three walk/hybrid functions at the reference's parameters
    (test_similarity.py:242-246: alpha=0.8, beta=0.4; s_plus l1=l2=0.5
    l3=1 pop2='sum')."""
    X, m = topk_matrix
    got = collect_matrix(sps.p3alpha(m, alpha=0.8, k=50))
    exp = O.topk_np(O.s_plus_np(_l1_pow(X, 0.8), _l1_pow(X.T, 0.8)), 50)
    assert_topk_equal(got, exp, rtol=1e-4)

    got = collect_matrix(sps.rp3beta(m, alpha=0.8, beta=0.4, k=50))
    pop = X.T.sum(axis=0)  # col sums of m2=m1.T before normalization
    exp = O.topk_np(
        O.s_plus_np(_l1_pow(X, 0.8), _l1_pow(X.T, 0.8),
                    l3=1.0, pop2=pop, p2=0.4),
        50,
    )
    assert_topk_equal(got, exp, rtol=1e-4)

    got = collect_matrix(
        sps.s_plus(m, l1=0.5, l2=0.5, l3=1.0, t1=1.0, t2=1.0, c1=0.5, c2=0.5,
                   alpha=1.0, beta1=0.0, beta2=0.0, pop1="none", pop2="sum",
                   k=50)
    )
    exp = O.topk_np(
        O.s_plus_np(X, X.T, l1=0.5, l2=0.5, l3=1.0, t1=1.0, t2=1.0,
                    c1=0.5, c2=0.5, pop1="none", pop2="sum", p1=0.0, p2=0.0),
        50,
    )
    assert_topk_equal(got, exp, rtol=1e-4)


def test_reference_normalizations(spark):
    """test_normalization.py:12-69 on the replayed 100x50 matrix."""
    X = _load_dense("norm_small")
    m = to_matrix_df(spark, X)
    for norm in ("l1", "l2", "max"):
        got = collect_matrix(sps.normalize(m, norm=norm, axis=1))
        exp_dense = O.norm_scale(X.copy(), norm, axis=1)
        r, c = np.nonzero(exp_dense)
        exp = {}
        for i, j in zip(r, c):
            exp.setdefault(int(i), []).append((int(j), exp_dense[i, j]))
        for row in exp:
            exp[row].sort(key=lambda t: (-t[1], t[0]))
        assert_topk_equal(got, exp, rtol=1e-6)

    # the reference divides by the DECLARED row count (incl. empty rows)
    got = collect_matrix(sps.tfidf(m, n_rows=X.shape[0]))
    exp_dense = O.tfidf_np(X.copy())
    r, c = np.nonzero(exp_dense)
    exp = {}
    for i, j in zip(r, c):
        exp.setdefault(int(i), []).append((int(j), exp_dense[i, j]))
    for row in exp:
        exp[row].sort(key=lambda t: (-t[1], t[0]))
    assert_topk_equal(got, exp, rtol=1e-6)


def test_reference_bm25(spark):
    """test_normalization.py:72-96: BM25 on the replayed 200x100 d=0.05
    matrix vs the literal-loop formula (transcribed in oracle_numpy),
    rtol 1e-3 as in the reference test."""
    X = _load_dense("norm_bm25")
    m = to_matrix_df(spark, X)
    got = collect_matrix(sps.bm25(m, k1=1.2, b=0.75, n_rows=X.shape[0]))
    exp_dense = O.bm25plus_np(X.copy(), k1=1.2, b=0.75, delta=0.0)
    r, c = np.nonzero(exp_dense)
    exp = {}
    for i, j in zip(r, c):
        exp.setdefault(int(i), []).append((int(j), exp_dense[i, j]))
    for row in exp:
        exp[row].sort(key=lambda t: (-t[1], t[0]))
    assert_topk_equal(got, exp, rtol=1e-3)
