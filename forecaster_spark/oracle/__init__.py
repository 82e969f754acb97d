"""Pure-NumPy golden oracle replicating the reference Forecaster semantics.

Every function documents the reference location (file:line under
/root/reference) whose observable behavior it reproduces. The code is written
from the *semantics* (SURVEY.md §2, verified by execution), not copied: no
sklearn/statsmodels dependency, different structure, vectorized where the
reference loops.
"""

from forecaster_spark.oracle.ref import (  # noqa: F401
    Q_MEAN,
    MinMaxScaler,
    StandardScaler,
    ar_autoreg_ols_fit,
    ar_dynamic_forecast,
    ar_yule_walker_fit,
    arx_design_matrix,
    arx_symb_design_matrix,
    backcast_weighted,
    backfill_column,
    backfill_matrix,
    diagnose,
    direct_forecast,
    lag_matrix,
    lead_matrix,
    mae,
    mse,
    ols_fit,
    ols_fit_multi,
    r2,
    r2_adjusted,
    recursive_forecast,
    roll_validate,
    smape,
    trend_matrix,
)
from forecaster_spark.oracle.model import RefARX  # noqa: F401
