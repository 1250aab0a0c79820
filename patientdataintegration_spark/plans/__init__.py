from patientdataintegration_spark.plans.inspect import (  # noqa: F401
    count_shuffles,
    explain_str,
    has_broadcast_join,
    pushed_filters,
)
