from forecaster_spark.streaming.rollup_stream import stream_rollup_1m, run_stream_to_memory  # noqa: F401
