"""User-facing facade: one object that makes the repo a complete,
standalone engine for someone switching from the reference pipeline.

    from patientdataintegration_spark.engine import Engine

    eng = Engine(data_dir="/root/testdata/sf0.01")
    eng.table("orders")                  # catalog DataFrame
    eng.sql("SELECT count(*) FROM lineitem")   # SQL over the same catalog
    eng.run("q45_full_pipeline")         # any named suite query
    eng.explain("q04_auroc")             # its physical plan
    eng.names()                          # every available query

The reference's entry points map directly: `Experiment()`'s ETL
stage is `run("q45_full_pipeline")`'s first half, the notebook's
evaluation queries are q02-q05/q16-q17, and the per-experiment
config loop (`run_experiments.py:11-17`) becomes parameterized
`run()` calls on one long-lived SparkSession instead of one OS
process per experiment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from patientdataintegration_spark.session import build_session
from patientdataintegration_spark.sources.catalog import TABLES, load_table, register_views


class Engine:
    def __init__(
        self,
        data_dir: str,
        spark: SparkSession | None = None,
        app_name: str = "pdi-engine",
    ) -> None:
        self.spark = spark or build_session(app_name)
        self.data_dir = data_dir
        self._views_registered = False

    # --- catalog -----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.data_dir, name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    # --- SQL ---------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            register_views(self.spark, self.data_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # --- named query suite -------------------------------------------------
    def names(self) -> list[str]:
        from patientdataintegration_spark.suite import QUERIES

        return sorted(QUERIES)

    def run(self, name: str) -> DataFrame:
        from patientdataintegration_spark.suite import QUERIES

        if name not in QUERIES:
            raise KeyError(f"unknown query {name!r}; see names()")
        return QUERIES[name](self.spark, self.data_dir)

    def oracle_sql(self, name: str) -> str | None:
        """The DuckDB-runnable twin, where one exists (None for
        rows-only lanes: streaming, pandas-UDF, ML ensembles)."""
        from patientdataintegration_spark.suite import ORACLES

        return ORACLES.get(name)

    def explain(self, name: str, mode: str = "formatted") -> str:
        from patientdataintegration_spark.plans.inspect import explain_str

        return explain_str(self.run(name), mode)
