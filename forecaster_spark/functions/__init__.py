from forecaster_spark.functions.gorilla import (  # noqa: F401
    gorilla_decode,
    gorilla_encode,
    pack_rollup_gorilla,
)
