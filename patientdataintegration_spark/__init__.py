"""patientdataintegration_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(DBO-DKFZ/PatientDataIntegration, surveyed in SURVEY.md): relational
ETL (scan/union/impute/encode), stratified splits and seeded
per-group sampling, grouped score aggregation, macro metrics
(balanced accuracy, rank-based AUROC), conditional fusion analytics,
plus large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) and a Structured
Streaming lane.

Design stance (SURVEY.md §7): every operator is a lazy DataFrame
transformation built from native `pyspark.sql.functions` so Catalyst
can push filters/prune columns/choose join strategies; Python UDFs
are confined to genuinely non-relational work (image decode, model
inference) and always Arrow-batched.
"""

__version__ = "0.1.0"

from patientdataintegration_spark.session import build_session  # noqa: F401
