"""Parity tests for the nine similarity functions + knobs against the NumPy
oracle — mirrors the reference's tests/test_similarity.py coverage: top-k
(289-300), full-row (303-314), shrink types (317-334), README composition
(359-381), target_rows (393-425), filter/target cols array (428-502) and
sparse-matrix form (543-617)."""

from __future__ import annotations

import numpy as np
import pytest

import similaripy_spark as sps
from tests import oracle_numpy as O
from tests.conftest import assert_topk_equal, collect_matrix, to_matrix_df

K = 30


def run(spark, fn, X1, X2=None, oracle_kwargs=None, **kwargs):
    df1 = to_matrix_df(spark, X1)
    df2 = to_matrix_df(spark, X2) if X2 is not None else None
    got = collect_matrix(fn(df1, df2, **kwargs))
    return got


# --- the 6 plain parameterizations, top-k ----------------------------------

CASES = [
    ("dot_product", dict(), dict()),
    ("cosine", dict(), dict(l2=1.0, c1=0.5, c2=0.5)),
    ("asymmetric_cosine", dict(alpha=0.2), dict(l2=1.0, c1=0.2, c2=0.8)),
    ("tversky", dict(alpha=0.8, beta=0.4), dict(l1=1.0, t1=0.8, t2=0.4)),
    ("jaccard", dict(), dict(l1=1.0, t1=1.0, t2=1.0)),
    ("dice", dict(), dict(l1=1.0, t1=0.5, t2=0.5)),
]


@pytest.mark.parametrize("name,kw,okw", CASES, ids=[c[0] for c in CASES])
def test_similarity_topk(spark, m_topk, name, kw, okw):
    fn = getattr(sps, name)
    got = run(spark, fn, m_topk, k=K, **kw)
    exp = O.topk_np(O.s_plus_np(m_topk, m_topk.T, **okw), K)
    assert_topk_equal(got, exp)


@pytest.mark.parametrize("name,kw,okw", CASES[:3], ids=[c[0] for c in CASES[:3]])
def test_similarity_full_row(spark, m_full, name, kw, okw):
    """k = n output cols → element-wise check (test_similarity.py:303-314)."""
    fn = getattr(sps, name)
    got = run(spark, fn, m_full, k=m_full.shape[0], **kw)
    exp = O.topk_np(O.s_plus_np(m_full, m_full.T, **okw), m_full.shape[0])
    assert_topk_equal(got, exp)


@pytest.mark.parametrize("shrink_type", ["stabilized", "bayesian", "additive"])
def test_shrink_types(spark, m_topk, shrink_type):
    got = run(spark, sps.cosine, m_topk, k=K, shrink=2.5, shrink_type=shrink_type)
    exp = O.topk_np(
        O.s_plus_np(m_topk, m_topk.T, l2=1.0, shrink=2.5,
                    shrink_type=shrink_type), K)
    assert_topk_equal(got, exp)


def test_binary_mode(spark, m_topk):
    got = run(spark, sps.jaccard, m_topk, k=K, binary=True)
    exp = O.topk_np(
        O.s_plus_np(m_topk, m_topk.T, l1=1.0, binary=True), K)
    assert_topk_equal(got, exp)


def test_threshold(spark, m_topk):
    thr = 0.3
    got = run(spark, sps.cosine, m_topk, k=K, threshold=thr)
    exp = O.topk_np(
        O.s_plus_np(m_topk, m_topk.T, l2=1.0, threshold=thr), K)
    assert_topk_equal(got, exp)


def test_p3alpha(spark, m_topk):
    got = run(spark, sps.p3alpha, m_topk, alpha=0.7, k=K)
    X1 = O.norm_scale(m_topk, "l1", 1) ** 0.7
    X1[O.norm_scale(m_topk, "l1", 1) == 0] = 0
    X2 = O.norm_scale(m_topk.T, "l1", 1) ** 0.7
    X2[O.norm_scale(m_topk.T, "l1", 1) == 0] = 0
    exp = O.topk_np(O.s_plus_np(X1, X2), K)
    assert_topk_equal(got, exp)


def test_rp3beta(spark, m_topk):
    got = run(spark, sps.rp3beta, m_topk, alpha=0.9, beta=0.6, k=K)
    pop = m_topk.T.sum(axis=0)  # col sums of m2=m1.T before normalization
    X1 = O.norm_scale(m_topk, "l1", 1) ** 0.9
    X1[m_topk == 0] = 0
    X2 = O.norm_scale(m_topk.T, "l1", 1) ** 0.9
    X2[m_topk.T == 0] = 0
    exp = O.topk_np(
        O.s_plus_np(X1, X2, l3=1.0, pop2=pop, p2=0.6), K)
    assert_topk_equal(got, exp)


def test_s_plus_generalized(spark, m_topk):
    kw = dict(l1=0.3, l2=0.5, l3=0.2, t1=0.7, t2=0.4, c1=0.6, c2=0.4,
              pop1="sum", pop2="sum", p1=0.2, p2=0.3, alpha=1.2)
    got = run(spark, sps.s_plus, m_topk, k=K, **kw)
    exp = O.topk_np(O.s_plus_np(m_topk, m_topk.T, **kw), K)
    assert_topk_equal(got, exp)


def test_s_plus_defaults_match_reference(spark, m_topk):
    """s_plus() with NO l-params must blend Tversky+Cosine at 0.5/0.5 (the
    reference's public defaults, similarity.py:509-510), not raw dot
    products; beta1/beta2 are the reference's names for the depop exponents
    and p1/p2 stay accepted as aliases."""
    got = run(spark, sps.s_plus, m_topk, k=K)
    exp = O.topk_np(O.s_plus_np(m_topk, m_topk.T, l1=0.5, l2=0.5), K)
    assert_topk_equal(got, exp)

    kwb = dict(l1=0.0, l2=0.0, l3=1.0, pop1="sum", pop2="sum")
    via_beta = run(spark, sps.s_plus, m_topk, k=K, beta1=0.2, beta2=0.3, **kwb)
    via_p = run(spark, sps.s_plus, m_topk, k=K, p1=0.2, p2=0.3, **kwb)
    assert_topk_equal(via_beta, via_p)


def test_target_rows(spark, m_topk):
    targets = [1, 14, 8, 200]
    got = run(spark, sps.cosine, m_topk, k=K, target_rows=targets)
    full = O.topk_np(O.s_plus_np(m_topk, m_topk.T, l2=1.0), K)
    exp = {r: v for r, v in full.items() if r in set(targets)}
    assert_topk_equal(got, exp)


def test_filter_cols_array(spark, m_topk):
    excl = list(range(0, 60))
    got = run(spark, sps.dot_product, m_topk, k=K, filter_cols=excl)
    S = O.s_plus_np(m_topk, m_topk.T)
    S[:, excl] = 0
    exp = O.topk_np(S, K)
    assert_topk_equal(got, exp)
    for r, entries in got.items():
        assert all(c >= 60 for c, _ in entries)


def test_target_cols_array(spark, m_topk):
    incl = list(range(30, 90))
    got = run(spark, sps.dot_product, m_topk, k=K, target_cols=incl)
    S = O.s_plus_np(m_topk, m_topk.T)
    mask = np.zeros(S.shape[1], dtype=bool)
    mask[incl] = True
    S[:, ~mask] = 0
    exp = O.topk_np(S, K)
    assert_topk_equal(got, exp)


def test_filter_cols_matrix(spark, m_topk):
    """Per-row (row, col) exclude mask over the OUTPUT shape (the recommender
    'filter seen' op, test_similarity.py:543-617)."""
    n = m_topk.shape[0]  # output is n×n for m2 = m1.T
    mask = O.np.random.default_rng(7).random((n, n)) < 0.1
    mr, mc = O.np.nonzero(mask)
    mask_df = to_matrix_df(spark, mask.astype(float)).select("row", "col")
    df1 = to_matrix_df(spark, m_topk)
    got = collect_matrix(sps.dot_product(df1, None, k=K, filter_cols=mask_df))
    S = O.s_plus_np(m_topk, m_topk.T)
    S[mask] = 0
    exp = O.topk_np(S, K)
    assert_topk_equal(got, exp)
    for r, entries in got.items():
        assert all(not mask[r, c] for c, _ in entries)


def test_target_cols_matrix(spark, m_topk):
    """Per-row (row, col) include mask (s_plus.h:173-188)."""
    n = m_topk.shape[0]
    mask = O.np.random.default_rng(8).random((n, n)) < 0.4
    mask_df = to_matrix_df(spark, mask.astype(float)).select("row", "col")
    df1 = to_matrix_df(spark, m_topk)
    got = collect_matrix(sps.dot_product(df1, None, k=K, target_cols=mask_df))
    S = O.s_plus_np(m_topk, m_topk.T)
    S[~mask] = 0
    exp = O.topk_np(S, K)
    assert_topk_equal(got, exp)


def test_readme_composition(spark, m_full):
    """The reference's flagship pipeline (README.md:73-95):
    bm25 → cosine model → dot_product recommend with filter_cols=urm."""
    urm_df = to_matrix_df(spark, m_full)
    urm_w = sps.bm25(urm_df, n_rows=m_full.shape[0])
    from similaripy_spark.matrix import transpose

    model = sps.cosine(transpose(urm_w), k=20)
    rec = sps.dot_product(
        urm_w, transpose(model), k=10,
        target_rows=[1, 14, 8], filter_cols=urm_df.select("row", "col"))
    got = collect_matrix(rec)

    Xw = O.bm25plus_np(m_full, delta=0.0)
    Sm = O.s_plus_np(Xw.T, Xw, l2=1.0)
    Wk = np.zeros_like(Sm)
    for r, entries in O.topk_np(Sm, 20).items():
        for c, v in entries:
            Wk[r, c] = v
    R = O.s_plus_np(Xw, Wk.T)
    R[m_full != 0] = 0
    exp = O.topk_np(R, 10)
    exp = {r: v for r, v in exp.items() if r in {1, 14, 8}}
    assert_topk_equal(got, exp, rtol=1e-4)
