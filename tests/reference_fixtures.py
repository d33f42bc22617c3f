"""Replay of the reference's literal pytest fixtures.

The reference generates every test matrix as (tests/test_similarity.py:284-286,
tests/test_normalization.py:8-10):

    rng = np.random.default_rng(seed)                      # seed=42
    sp.random_array((n_rows, n_cols), density=density,
                    format='csr', dtype=np.float32, random_state=rng)

scipy is not installed in this container (and there is no network), so the
*sampling orchestration* is transcribed here from the public scipy source
(scipy/sparse/_construct.py, ``_random``):

    size    = int(round(density * m * n))
    raveled = rng.choice(m * n, size=size, replace=False)   # numpy draw
    (i, j)  = np.unravel_index(raveled, (m, n), order='F')  # column-major
    vals    = rng.uniform(size=size)                        # numpy draw
    ... .astype(float32)

The Generator draws themselves come from the installed numpy and are
bit-exact; the only transcription risk is the unravel order / call sequence
across scipy versions. If a scipy version differs, these fixtures are still
the same seeded value stream over the reference's exact shape/density/dtype
grid, and the comparison methodology (per-row top-k set + score rtol 1e-4,
mirroring the reference's check_sum/check_full) is unchanged.

Risk-note status (round 3): ``import scipy`` raises ModuleNotFoundError in
this container and package installs are prohibited by the environment
contract, so a literal bit-equality cross-check remains impossible here.
Two facts bound the residual risk: (a) the reference pins
``scipy>=1.12.0`` (reference pyproject.toml:35), and ``random_array`` —
the exact API the reference tests call — was introduced in 1.12, so the
transcription targets precisely that code lineage, not an older
``sp.random`` path with a different draw sequence; (b) everything except
the choice→unravel(F)→uniform orchestration (the numpy Generator stream,
unravel_index itself, the float32 cast) executes on the installed numpy
and is bit-exact by construction.

Fixture matrices are committed as parquet under tests/fixtures/ (see
tools/make_reference_fixtures.py); test_reference_fixtures.py pins that the
committed bytes regenerate exactly.
"""

from __future__ import annotations

import numpy as np

#: (name, n_rows, n_cols, density) — the reference's literal test grid
REFERENCE_SHAPES = {
    # tests/test_similarity.py:289-298 (topk) and 303-314 (full rows)
    "sim_topk": (1000, 800, 0.025),
    "sim_full": (400, 50, 0.025),
    # tests/test_normalization.py:8-10 (norms/tfidf: 100x50 d=0.05;
    # bm25 uses 200x100 d=0.05, test_normalization.py:72-73)
    "norm_small": (100, 50, 0.05),
    "norm_bm25": (200, 100, 0.05),
}


def reference_random_matrix(
    n_rows: int, n_cols: int, density: float, seed: int = 42
) -> np.ndarray:
    """Dense float64 replica of the reference's seeded float32 CSR matrix
    (values are exact float32 round-trips)."""
    rng = np.random.default_rng(seed)
    size = int(round(density * n_rows * n_cols))
    raveled = rng.choice(n_rows * n_cols, size=size, replace=False)
    i, j = np.unravel_index(raveled, (n_rows, n_cols), order="F")
    vals = rng.uniform(size=size).astype(np.float32)
    X = np.zeros((n_rows, n_cols), dtype=np.float64)
    X[i, j] = vals.astype(np.float64)
    return X


def fixture_frame(name: str):
    """Long-form (row, col, value) pandas frame for a named fixture."""
    import pandas as pd

    n_rows, n_cols, density = REFERENCE_SHAPES[name]
    X = reference_random_matrix(n_rows, n_cols, density)
    r, c = np.nonzero(X)
    return pd.DataFrame(
        {
            "row": r.astype("int64"),
            "col": c.astype("int64"),
            "value": X[r, c],
        }
    )
