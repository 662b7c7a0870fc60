"""Arrow scalar pandas UDFs — the escape hatch for per-row logic Spark's
built-ins can't express (external scorers, real tokenizers, model
inference).  Vectorized over Arrow batches, never per-row Python.

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the eval type from the REAL type hints, and PEP-563 stringified hints
break that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def vowel_density(text: pd.Series) -> pd.Series:
    """Fraction of characters that are vowels, rounded HALF-UP to 6 dp
    (pandas .round is banker's rounding — half-to-even — which disagrees
    with Spark/DuckDB round on exact .5 ties, e.g. 41/128; clip guards
    the empty string)."""
    import numpy as np

    n = text.str.len().clip(lower=1)
    x = text.str.lower().str.count("[aeiou]") / n
    return np.floor(x * 1e6 + 0.5) / 1e6
