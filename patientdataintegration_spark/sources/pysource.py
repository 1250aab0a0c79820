"""Spark 4 Python DataSource: a deterministic synthetic-corpus
generator (`synth_docs`) — the "infinite test data" source a
100 TB pipeline uses to load-test itself WITHOUT storing 100 TB
(reference analogue: the config/glob batch driver S4 feeds fixed
files; this is its generate-on-read twin).

Why a custom DataSource instead of `spark.range().select(...)`:
the DataSource API is the extension point a user of the engine
would reach for to attach THEIR system (a REST catalog, a scanner
over an internal blob store), so the engine ships a worked, tested
example exercising the full surface:

- **partition planning**: `partitions()` splits the id space into
  `parts` ranges -> one task each, embarrassingly parallel at any
  cluster width;
- **filter pushdown**: `pushFilters` consumes range/equality
  predicates on `doc_id` and PRUNES whole partitions (the Python
  twin of parquet min/max row-group pruning) — consumed filters are
  removed from Spark's plan so rows never cross the Python->JVM
  boundary at all;
- **deterministic content**: every row is a pure function of
  doc_id (plain integer arithmetic — no RNG), so a DuckDB
  `range()` twin can replay the identical relation and the
  oracle gate can hash-compare a query OVER a custom source.

Rows are yielded as pyarrow RecordBatches (the fast path — tuple
yield is row-at-a-time pickling).

The STREAMING half of the DataSource API lives in the sibling
`sources/pydatasource.py` (`synthetic_events`: checkpointed
{"next_id"} offsets + deterministic readBetweenOffsets replay);
q196 runs that source through a streaming aggregation and the
restart pytest proves offset resumption.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

DEFAULT_N = 1000
DEFAULT_PARTS = 8
_SCHEMA_DDL = "doc_id bigint, text string, lang string, n_tokens bigint"


def synth_tokens(doc_id: int) -> list[str]:
    """5..11 tokens, each 't<k>' with k = (doc_id*31 + i) % 97 —
    mirrored exactly by the DuckDB oracle fragment below."""
    n = 5 + doc_id % 7
    return [f"t{(doc_id * 31 + i) % 97}" for i in range(n)]


SYNTH_DOCS_ORACLE_SQL = """
    SELECT gs.range AS doc_id,
           array_to_string(list_transform(range(0, 5 + gs.range % 7),
                           i -> concat('t', (gs.range * 31 + i) % 97)), ' ') AS text,
           CASE gs.range % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
           5 + gs.range % 7 AS n_tokens
    FROM range(0, {n}) gs
"""


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", DEFAULT_N))
        self.parts = max(1, int(options.get("parts", DEFAULT_PARTS)))
        # pushed bounds on doc_id, refined by pushFilters
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters: list[Filter]):  # noqa: D102
        for f in filters:
            consumed = False
            if getattr(f, "attribute", None) == ("doc_id",):
                v = getattr(f, "value", None)
                if isinstance(f, GreaterThan) and isinstance(v, int):
                    self.lo = max(self.lo, v + 1)
                    consumed = True
                elif isinstance(f, GreaterThanOrEqual) and isinstance(v, int):
                    self.lo = max(self.lo, v)
                    consumed = True
                elif isinstance(f, LessThan) and isinstance(v, int):
                    self.hi = min(self.hi, v)
                    consumed = True
                elif isinstance(f, LessThanOrEqual) and isinstance(v, int):
                    self.hi = min(self.hi, v + 1)
                    consumed = True
                elif isinstance(f, EqualTo) and isinstance(v, int):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                    consumed = True
            if not consumed:
                yield f  # unsupported -> Spark keeps evaluating it

    def partitions(self) -> list[InputPartition]:  # noqa: D102
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_RangePartition(0, 0)]
        span = hi - lo
        per = max(1, (span + self.parts - 1) // self.parts)
        return [
            _RangePartition(s, min(s + per, hi))
            for s in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition):  # noqa: D102
        import pyarrow as pa

        ids, texts, langs, ntoks = [], [], [], []
        for doc_id in range(partition.start, partition.end):
            toks = synth_tokens(doc_id)
            ids.append(doc_id)
            texts.append(" ".join(toks))
            langs.append(("en", "de", "fr")[doc_id % 3])
            ntoks.append(len(toks))
        yield pa.record_batch(
            [
                pa.array(ids, pa.int64()),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
                pa.array(ntoks, pa.int64()),
            ],
            names=["doc_id", "text", "lang", "n_tokens"],
        )


class SynthDocsDataSource(DataSource):
    """`spark.read.format("synth_docs").option("n", N).option("parts", P)`"""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "synth_docs"

    def schema(self) -> str:  # noqa: D102
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> SynthDocsReader:  # noqa: D102
        return SynthDocsReader(self.options)


def register_synth_docs(spark) -> None:
    """Idempotent registration of the custom source.

    Also enables `spark.sql.python.filterPushdown.enabled` on THIS
    session: it is a runtime SQL conf, and a session built without
    `session.py`'s conf block (the round-5 driver session) fails any
    scan of a pushFilters-implementing source with
    DATA_SOURCE_PUSHDOWN_DISABLED. Registration is the chokepoint
    every consumer goes through, so the source carries its own
    prerequisite instead of trusting the session factory."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
