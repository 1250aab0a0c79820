"""The engine's named query suite — SURVEY.md §2 operator inventory
re-expressed over the driver's star schema, each with an ANSI-SQL
oracle twin for the DuckDB correctness gate.

Exactness contract (why results hash-match bit-for-bit across
engines and partitionings):

- sums of money-like doubles go through `CAST(x AS DECIMAL(18,4))`
  — decimal addition is exact and order-independent, then one
  deterministic cast back to double;
- "score" columns are integer-valued doubles (`FLOOR(x*1000)`), so
  their sums/averages are exact in double precision;
- rank statistics (AUROC) only depend on score *order* plus sums of
  integers/halves — exact below 2^53;
- the only rounded outputs are stddev (A11) and cosine similarity,
  rounded to 6/4 digits where accumulation order genuinely differs.
"""

from patientdataintegration_spark.suite.core import ORACLES as CORE_ORACLES
from patientdataintegration_spark.suite.core import QUERIES as CORE_QUERIES
from patientdataintegration_spark.suite.ext import ORACLES as EXT_ORACLES
from patientdataintegration_spark.suite.ext import QUERIES as EXT_QUERIES

QUERIES = {**CORE_QUERIES, **EXT_QUERIES}
ORACLES = {**CORE_ORACLES, **EXT_ORACLES}
