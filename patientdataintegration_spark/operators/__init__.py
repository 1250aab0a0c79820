from patientdataintegration_spark.operators.imputation import impute_mean, impute_mode, mode_value  # noqa: F401
from patientdataintegration_spark.operators.encodings import (  # noqa: F401
    bucketize_age2,
    bucketize_age3,
    onehot_columns,
    scale01,
)
from patientdataintegration_spark.operators.sampling import sample_per_group  # noqa: F401
from patientdataintegration_spark.operators.splits import assign_folds, balance_audit, fold_to_set  # noqa: F401
from patientdataintegration_spark.operators.scoring import group_scores  # noqa: F401
from patientdataintegration_spark.operators.fusion import naive_fusion, threshold_sweep  # noqa: F401
