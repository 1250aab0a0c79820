from patientdataintegration_spark.streaming.events import (  # noqa: F401
    run_tumbling_counts_stream,
    tumbling_counts,
)
