from forecaster_spark.streaming.rollup_stream import stream_rollup_1m, run_stream_to_memory  # noqa: F401
from forecaster_spark.streaming.stateful import stream_locf, run_stream_locf_to_memory  # noqa: F401
