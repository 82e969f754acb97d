from forecaster_spark.plans.checkpoint import StageRunner  # noqa: F401
from forecaster_spark.plans.pipeline import run_rollup_pipeline  # noqa: F401
from forecaster_spark.plans.skew import salted_rollup_raw  # noqa: F401
