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


@pandas_udf("double")
def exact_median(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the UDAF seam, §2.10): Series -> scalar,
    usable directly inside ``groupBy().agg(...)``.  Exact median is the
    canonical NON-COMBINABLE aggregate -- no partial-agg form exists
    (that is exactly why percentile_approx exists for the 100 TB path;
    agg_approx_quantile_report checks its contract).  Spark ships each
    group's full value set to one reducer for this eval type, so a
    GROUPED_AGG UDAF is only for group sizes that fit one task's memory
    -- the cost is structural, not an implementation detail.

    Determinism: np.median sorts; for even n the result is the mean of
    the two middle values -- one IEEE op, matching DuckDB's median()."""
    import numpy as np

    return float(np.median(v))
