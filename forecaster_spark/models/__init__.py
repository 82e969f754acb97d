from forecaster_spark.models.kernels import fit_params, forecast_long, qof_table  # noqa: F401
from forecaster_spark.models.metrics import qof_native  # noqa: F401
