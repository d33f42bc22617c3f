"""Deterministic tokenizer.

The reference operates on pre-tokenized matrices (no string ops anywhere in
similaripy); the north rule adds the tokenize stage: a pure function of
``text`` (byte-identical text per url ⇒ deterministic postings).

Rule: lowercase, split on runs of non-[a-z0-9], drop empties. Two equivalent
implementations, tested for agreement:

* ``tokenize_expr``   — built-in Catalyst expression (JVM-side, codegen'd);
  the default everywhere.
* ``tokenize_udf``    — Arrow-vectorized pandas UDF (the input_hint names
  this surface explicitly); pandas string kernels, no per-row Python.

The SQL-oracle twin (DuckDB) is
``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` filtered for ''.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: complement of TOKEN_SPLIT_RE: one maximal token run. Counting
#: non-overlapping matches of this on LOWERED text equals the number of
#: non-empty tokens the split produces (lowering first matters: some
#: non-ASCII uppercase chars lower into [a-z], e.g. the Kelvin sign → k).
TOKEN_RUN_RE = "[a-z0-9]+"


def tokenize_expr(text: Column) -> Column:
    """text → array<string> of tokens (built-in functions only)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def _tokenize_pd(text: pd.Series) -> pd.Series:
    parts = text.str.lower().str.split(TOKEN_SPLIT_RE, regex=True)
    return parts.map(lambda toks: [t for t in toks if t])


# explicit ArrayType (not a DDL string) so import needs no active session
tokenize_udf = pandas_udf(_tokenize_pd, T.ArrayType(T.StringType()))

