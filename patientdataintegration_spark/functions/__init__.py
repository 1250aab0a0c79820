from patientdataintegration_spark.functions.deterministic import pseudo_random, md5_bigint  # noqa: F401
from patientdataintegration_spark.functions.metrics import (  # noqa: F401
    auroc,
    balanced_accuracy,
    mean_std_over,
)
from patientdataintegration_spark.functions.scalars import (  # noqa: F401
    oriented_score,
    pairwise_softmax,
    sigmoid,
    threshold_pred,
)
