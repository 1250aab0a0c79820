"""Round-9 additions: the sessionizer state-store audit (q245 — the
q236 introspection pattern extended to the CUSTOM stateful operator,
the r8 verdict's item 6), the nightly-maintenance flagship composing
the whole incremental family into one delta-driven DAG (q246 — item
7), and persisted-Bloom-store replay across two delta days (q247 —
stretch item 8).

Scale stance (100 TB): q245's audit cost is sink + live-state volume
(one O(1) row per open session key — watermark-horizon-bounded),
read partition-parallel from the checkpoint; q246's delta path
touches history only through mergeable state tables and broadcast
delta joins (the reconciliation twin is the thing a nightly job runs
ONCE to certify, not per delta); q247 turns the daily dedup's
history re-scan into an OR-merge of two word-bitmap relations —
kilobytes of I/O regardless of store size.

Exactness contract (suite/core.py rules): q245 replays the
ms-calibrated timeout frontier of tests/test_statestore_audit.py;
q246 emits only integer counts and equality verdicts computed from
DECIMAL-exact or bit-exact comparisons; q247 is bit-identical to the
plain NOT EXISTS by Bloom's no-false-negative guarantee (the q240
argument, now across a persisted store generation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from patientdataintegration_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --- sessionizer state-store audit -------------------------------------------


@_register(
    "q245_sessionizer_state_audit",
    """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    l AS (
      SELECT user_id, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      FROM e
    ),
    t AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 43200000000 THEN 1 ELSE 0 END AS new_s
      FROM l
    ),
    s AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM t
    ),
    g AS (
      SELECT user_id, MIN(us) AS session_start_us,
             MAX(us) AS session_end_us, COUNT(*) AS n_events
      FROM s GROUP BY user_id, session_id
    ),
    wm AS (
      SELECT CAST(FLOOR(MAX(epoch_us(ts)) / 1000) AS BIGINT) AS wm_ms
      FROM events
    ),
    lastf AS (
      SELECT user_id, MAX(session_end_us) AS last_end FROM g GROUP BY user_id
    )
    SELECT g.user_id, g.session_start_us, g.session_end_us, g.n_events,
           CASE WHEN g.session_end_us < lastf.last_end
                  OR (CAST(FLOOR((g.session_end_us + 43200000000) / 1000)
                           AS BIGINT) + 1) < wm.wm_ms
                THEN 'emitted' ELSE 'state' END AS origin
    FROM g JOIN lastf USING (user_id), wm
    """,
)
def q245_sessionizer_state_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store audit of the CUSTOM stateful sessionizer
    (`streaming/statestore.sessionize_statestore_audit`): drain
    `applyInPandasWithState` sessionization against a pinned
    checkpoint, read the keyed state back via the statestore source
    (one `value.groupState` row per live open session), and union it
    with the emitted sink under an `origin` column. Emitted ∪ state
    reconstructs the batch sessionization EXACTLY — q96 pins WHICH
    sessions a restart-safe consumer has seen; this lane additionally
    proves the NOT-yet-seen remainder is fully recoverable from the
    checkpoint, the audit that lets a 100 TB pipeline trust the
    stream's state as the source of truth. The oracle replays the
    batch gap-split plus the ms-calibrated timeout frontier (q96's
    rule: a trailing session emitted iff floor((end+gap)/1000)+1 <
    floor(max_us/1000)); everything else is live state. Scale: state
    is O(1) per open key (watermark-horizon-bounded), read
    partition-parallel; audit cost = sink + horizon, independent of
    history. Integer microsecond payloads — hash-exact by
    construction."""
    from patientdataintegration_spark.streaming.statestore import (
        sessionize_statestore_audit,
    )

    return sessionize_statestore_audit(
        spark,
        sf_dir,
        gap_seconds=43200,
        watermark="0 seconds",
        table_name="q245_emitted",
    )
