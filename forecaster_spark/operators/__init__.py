from forecaster_spark.operators.seriesify import seriesify, events_as_series  # noqa: F401
from forecaster_spark.operators.rollup import (  # noqa: F401
    TIERS,
    rollup_cascade,
    rollup_raw,
    rollup_tiers,
)
