from forecaster_spark.sources.readers import (  # noqa: F401
    TESTDATA_TABLES,
    read_corpus,
    read_csv_series,
    read_table,
    register_testdata_views,
    write_bucketed,
    write_tiered,
)
