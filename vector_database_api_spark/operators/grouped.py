"""Batch grouped-map Python kernels via ``applyInPandas``.

The last UDF shape in the surface matrix (scalar pandas UDFs: vector
math serving paths; mapInPandas: multimodal decode; grouped-agg with
state: streaming profiles).  ``applyInPandas`` hands each group to a
Python function as ONE pandas DataFrame — the escape hatch for per-group
algorithms that need a numerical library rather than SQL aggregates
(model fits, scipy solvers, per-entity forecasting).

Contract at scale: one shuffle on the group key, each group must fit in
one task's memory (use it for many small groups, never one giant one —
that's what the salting/AQE-skew machinery in operators/skew.py is for).

The demonstration kernel is per-group OLS — chosen precisely because the
engine ALSO exposes it as regr_* SQL aggregates (queries.regression_
profile, DuckDB-oracle-checked), so the Python path is equality-testable
against the JVM path instead of being a black box.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OLS_SCHEMA = (
    "event_type string, slope double, intercept double, r2 double, n bigint"
)


def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["x"].to_numpy(dtype=np.float64)
    y = pdf["value"].to_numpy(dtype=np.float64)
    n = len(pdf)
    mx, my = x.mean(), y.mean()
    sxx = float(((x - mx) ** 2).sum())
    sxy = float(((x - mx) * (y - my)).sum())
    syy = float(((y - my) ** 2).sum())
    # Degenerate-group semantics mirror the JVM regr_* twin (SQL standard):
    # constant x (sxx=0) => slope/intercept/r2 all NULL; constant y with
    # varying x => slope 0, r2 = 1.
    if sxx == 0.0:
        slope = intercept = r2 = None
    else:
        slope = sxy / sxx
        intercept = my - slope * mx
        r2 = 1.0 if syy == 0.0 else (sxy * sxy) / (sxx * syy)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "slope": [slope],
            "intercept": [intercept],
            "r2": [r2],
            "n": [n],
        }
    )


def ols_per_group(df: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Per-group least-squares fit of value ~ x.  Requires columns
    (group_col, x, value)."""
    return df.groupBy(group_col).applyInPandas(_ols, schema=OLS_SCHEMA)
