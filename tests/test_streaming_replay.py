"""Deterministic-replay matrix for every streaming lane (round-5
verdict stretch item 7): each rows-only streaming query runs TWICE
over the same static input and the two sink tables must be
value-identical — the streaming analogue of the batch suite's
partition-invariance matrix. Micro-batch boundaries, state-store
eviction order, and task scheduling may differ between the runs;
none of that may leak into committed results, or the lane is not
exactly-once in any sense that matters.

(The per-lane batch twins pin WHAT the results are; this matrix pins
that re-execution reproduces them bit for bit. Same-checkpoint
restart/resume semantics are pinned separately in
test_stream_cdc.py / the pydatasource restart test.)
"""

from __future__ import annotations

import hashlib

import pytest

SF_DIR = "/root/testdata/sf0.001"

STREAMING_LANES = [
    "q88_stream_static_enrich",
    "q89_stream_dedup",
    "q90_stream_tumbling",
    "q96_stream_sessionize",
    "q99_stream_stream_join",
    "q180_stream_cdc_upsert",
    "q196_python_stream_source",
    "q201_stream_outer_join",
    "q223_stream_session_window",
    "q231_stream_full_outer_join",
]


def _value_hash(df) -> tuple[int, str]:
    """Order- and partitioning-insensitive content hash: every row
    canonicalized to sorted (column, repr) pairs, the row set sorted,
    md5 over the concatenation. repr is exact for ints/strings/None
    and for the deterministic doubles these lanes emit."""
    cols = sorted(df.columns)
    rows = sorted(
        tuple(repr(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.md5()
    h.update(repr(cols).encode())
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return len(rows), h.hexdigest()


@pytest.mark.parametrize("lane", STREAMING_LANES)
def test_streaming_lane_replays_identically(spark, lane):
    from patientdataintegration_spark.suite import QUERIES

    q = QUERIES[lane]
    n1, h1 = _value_hash(q(spark, SF_DIR))
    n2, h2 = _value_hash(q(spark, SF_DIR))
    assert n1 > 0, f"{lane}: empty result"
    assert (n1, h1) == (n2, h2), (
        f"{lane}: replay diverged ({n1} rows/{h1} vs {n2} rows/{h2})"
    )
