"""Parity tests for normalize/tfidf/bm25/bm25plus against the NumPy oracle —
mirrors the reference's test_normalization.py (manual-scipy oracles, full
TF×IDF mode grid per FIXTURES.md §5)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from similaripy_spark.functions import normalization as N
from tests import oracle_numpy as O
from tests.conftest import to_matrix_df


def _compare_cells(df, expected_dense, rtol=1e-9):
    got = {(r["row"], r["col"]): r["value"] for r in df.collect()}
    exp = {
        (int(i), int(j)): expected_dense[i, j]
        for i, j in zip(*np.nonzero(expected_dense))
    }
    # engine keeps cells that the oracle may have weighted to exactly 0
    # (e.g. idf==0); those are value-0 rows on the engine side
    for key, v in exp.items():
        assert key in got, f"missing cell {key}"
        np.testing.assert_allclose(got[key], v, rtol=rtol, atol=1e-12,
                                   err_msg=str(key))
    for key, v in got.items():
        if key not in exp:
            np.testing.assert_allclose(v, 0.0, atol=1e-12,
                                       err_msg=f"unexpected nonzero {key}")


@pytest.mark.parametrize("norm", ["l1", "l2", "max"])
@pytest.mark.parametrize("axis", [0, 1])
def test_normalize(spark, m_norm, norm, axis):
    df = N.normalize(to_matrix_df(spark, m_norm), norm=norm, axis=axis)
    _compare_cells(df, O.norm_scale(m_norm, norm, axis))


def test_normalize_negative_values_l1(spark):
    X = np.array([[1.0, -2.0, 0.0], [0.0, 0.0, 0.0], [-1.0, 1.0, 0.0]])
    df = N.normalize(to_matrix_df(spark, X), norm="l1", axis=1)
    _compare_cells(df, O.norm_scale(X, "l1", 1))


def test_normalize_max_nonpositive_row_skipped(spark):
    X = np.array([[-1.0, -2.0], [3.0, 1.0]])
    df = N.normalize(to_matrix_df(spark, X), norm="max", axis=1)
    _compare_cells(df, O.norm_scale(X, "max", 1))


@pytest.mark.parametrize("tf_mode", list(N.TF_MODES))
@pytest.mark.parametrize("idf_mode", list(N.IDF_MODES))
def test_tfidf_mode_grid(spark, m_norm, tf_mode, idf_mode):
    df = N.tfidf(
        to_matrix_df(spark, m_norm),
        tf_mode=tf_mode,
        idf_mode=idf_mode,
        n_rows=m_norm.shape[0],
    )
    _compare_cells(df, O.tfidf_np(m_norm, tf_mode=tf_mode, idf_mode=idf_mode))


@pytest.mark.parametrize("logbase", [math.e, 2.0])
@pytest.mark.parametrize("axis", [0, 1])
def test_bm25_default(spark, m_norm, axis, logbase):
    n = m_norm.shape[0] if axis == 1 else m_norm.shape[1]
    df = N.bm25(to_matrix_df(spark, m_norm), axis=axis, logbase=logbase, n_rows=n)
    exp = O.bm25plus_np(m_norm, axis=axis, delta=0.0, logbase=logbase)
    _compare_cells(df, exp)


def test_bm25plus_delta(spark, m_norm):
    df = N.bm25plus(to_matrix_df(spark, m_norm), delta=1.0, n_rows=m_norm.shape[0])
    _compare_cells(df, O.bm25plus_np(m_norm, delta=1.0))


@pytest.mark.parametrize("tf_mode", ["binary", "log", "freq"])
def test_bm25_tf_modes(spark, m_norm, tf_mode):
    df = N.bm25(to_matrix_df(spark, m_norm), tf_mode=tf_mode,
                n_rows=m_norm.shape[0])
    _compare_cells(df, O.bm25plus_np(m_norm, delta=0.0, tf_mode=tf_mode))


def test_bm25_empty_rows_count_in_avgdl(spark, m_norm):
    """Declared shape larger than observed rows → avgdl/N change
    (normalization.pyx:315, 323 divide by shape[0])."""
    n_declared = m_norm.shape[0] + 20
    X_padded = np.vstack([m_norm, np.zeros((20, m_norm.shape[1]))])
    df = N.bm25(to_matrix_df(spark, m_norm), n_rows=n_declared)
    _compare_cells(df, O.bm25plus_np(X_padded, delta=0.0)[: m_norm.shape[0]])


def test_idf_not_clamped_negative(spark):
    """A term in >N/2 docs gets negative idf (normalization.pyx:93-94)."""
    X = np.array(
        [[2.0, 1.0], [3.0, 0.0], [1.0, 0.0], [4.0, 0.0]]
    )  # term 0 in 4/4 docs → idf < 0
    df = N.bm25(to_matrix_df(spark, X), n_rows=4)
    exp = O.bm25plus_np(X, delta=0.0)
    assert exp[0, 0] < 0
    _compare_cells(df, exp)
