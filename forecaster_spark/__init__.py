"""forecaster_spark — a from-scratch PySpark-native time-series rollup +
downsample + retention engine with the query/data-processing capabilities of
the reference `Youseffekri/Forecaster` library (see SURVEY.md), re-expressed
Spark-first.

Subpackages
-----------
- ``sources``    : schema-declared readers/writers (parquet; Iceberg-layout dirs)
- ``operators``  : seriesify, tiered rollups, gap-fill, lag/lead/trend features,
                   scalers, dedup, similarity, text ops
- ``functions``  : scalar/aggregate expression helpers + Gorilla codec
- ``models``     : per-series applyInPandas kernels (ARX / ARX_Symb / ARX_D /
                   AR_YW fit + multi-horizon forecast + rolling validation)
- ``plans``      : checkpoint-resumable staged pipelines, lineage/metrics
                   tables, skew-aware (salted) aggregation
- ``streaming``  : Structured Streaming wrapper over the 1m rollup
- ``oracle``     : pure-NumPy re-implementation of the reference semantics,
                   used as the in-test golden oracle and inside kernels
"""

__version__ = "0.1.0"
