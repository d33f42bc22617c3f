"""Write the reference-replay fixture matrices (tests/reference_fixtures.py)
to tests/fixtures/*.parquet. Committed output; re-run only if the
transcription changes — test_reference_fixtures.py pins regeneration."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.reference_fixtures import REFERENCE_SHAPES, fixture_frame

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")
os.makedirs(out_dir, exist_ok=True)
for name in REFERENCE_SHAPES:
    pdf = fixture_frame(name)
    path = os.path.join(out_dir, f"{name}.parquet")
    pdf.to_parquet(path, index=False)
    print(f"{name}: {len(pdf)} nnz -> {path}")
