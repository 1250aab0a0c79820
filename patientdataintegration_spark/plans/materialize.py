"""Content-addressed parquet materialization cache.

The iterative graph queries (q130 PageRank, q138 recursive-CTE
reachability) materialize their expensive edge relation (shingle →
minhash → LSH) to parquet ONCE per corpus so each iteration re-scans
cheap parquet instead of re-executing the upstream — the 100-TB
discipline (`operators/graph.pagerank` docstring).

This module is the shared cache layer for those materializations,
hardened per the round-4 ADVICE findings:

- **Content-keyed**: the cache tag hashes the input files' (relative
  path, size, mtime_ns), not just the directory path — regenerating a
  corpus in place invalidates the cache instead of silently reusing
  stale edges.
- **Per-user root**: cache dirs live under a uid-scoped 0o700
  directory (falling back to a private mkdtemp if the expected root
  exists but is not ours), so a predictable world-shared /tmp path
  cannot be pre-created by another local user.
- **Atomic publish**: writers produce into a unique tmp dir and
  `rename` it to the final path — two concurrent cache-miss runs
  cannot interleave writes into one directory; the loser discards its
  tmp and reuses the winner's output.
- **Filesystem-correct completion check**: the completed-materialization
  marker (`_SUCCESS`) is resolved through the session's Hadoop
  FileSystem API, so the check works for hdfs:// / s3a:// checkpoint
  locations, not only local paths.
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def corpus_fingerprint(*paths: str) -> str:
    """md5 over each input's file inventory: sorted (relative path,
    size, mtime_ns) triples, plus the absolute path itself. Local
    filesystem only; for remote inputs (no os.stat) the stat portion
    degrades to path-only — still never weaker than the old scheme."""
    h = hashlib.md5()
    for p in paths:
        ap = os.path.abspath(p)
        h.update(ap.encode())
        try:
            if os.path.isfile(ap):
                st = os.stat(ap)
                h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
            elif os.path.isdir(ap):
                entries = []
                for root, _dirs, files in os.walk(ap):
                    for f in files:
                        fp = os.path.join(root, f)
                        st = os.stat(fp)
                        entries.append(
                            (os.path.relpath(fp, ap), st.st_size, st.st_mtime_ns)
                        )
                for rel, size, mt in sorted(entries):
                    h.update(f"|{rel}|{size}|{mt}".encode())
        except OSError as e:
            # Degrading to a path-only key mid-walk weakens cache
            # invalidation (an in-place corpus regen may be missed) —
            # that must leave a signal, not happen silently.
            logging.getLogger(__name__).warning(
                "corpus_fingerprint: stat walk of %s failed (%s); "
                "cache key for this input degrades to path-only",
                ap,
                e,
            )
    return h.hexdigest()[:16]


def _user_cache_root() -> str:
    """uid-scoped 0o700 cache root; a private mkdtemp if the expected
    path exists but is not an owned directory (pre-creation attack or
    uid collision on a shared tmp)."""
    root = os.path.join(
        tempfile.gettempdir(), f"pdi_cache_uid{os.getuid()}"
    )
    try:
        os.makedirs(root, mode=0o700, exist_ok=True)
        st = os.stat(root)
        if st.st_uid != os.getuid() or not os.path.isdir(root):
            raise OSError("cache root not owned by current user")
    except OSError:
        root = tempfile.mkdtemp(prefix="pdi_cache_")
    return root


def cache_path(kind: str, *input_paths: str) -> str:
    """Deterministic cache location for a derived relation that is a
    pure function of `input_paths` content: per-user root + kind +
    content fingerprint."""
    return os.path.join(
        _user_cache_root(), f"{kind}_{corpus_fingerprint(*input_paths)}"
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def is_materialized(spark: SparkSession, directory: str) -> bool:
    """True iff a COMPLETED parquet materialization exists at
    `directory` — `_SUCCESS` resolved through the session's Hadoop
    FileSystem (works for hdfs:// / s3a:// / file://), falling back
    to os.path for plain local paths if the JVM gateway is odd."""
    try:
        fs, _, jvm = _hadoop_fs(spark, directory)
        marker = jvm.org.apache.hadoop.fs.Path(directory + "/_SUCCESS")
        return bool(fs.exists(marker))
    except Exception:
        return os.path.isfile(os.path.join(directory, "_SUCCESS"))


def ensure_materialized(
    spark: SparkSession,
    final_dir: str,
    producer: Callable[[], DataFrame],
) -> str:
    """Idempotent, concurrency-safe parquet materialization: if a
    completed output already exists at `final_dir`, reuse it;
    otherwise run `producer()` into a unique tmp dir and atomically
    rename it into place. Two racing cache-miss writers each write
    their own tmp; exactly one rename wins, the loser deletes its tmp
    and reads the winner's (identical — the relation is a pure
    function of the inputs the cache key fingerprints)."""
    if is_materialized(spark, final_dir):
        return final_dir
    tmp = f"{final_dir}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    producer().write.mode("overwrite").parquet(tmp)
    try:
        fs, jfinal, jvm = _hadoop_fs(spark, final_dir)
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        # An incomplete dir at the final path (no _SUCCESS: a crashed
        # or in-flight write) must be removed first — Hadoop rename
        # onto an existing directory would nest tmp INSIDE it.
        if fs.exists(jfinal) and not is_materialized(spark, final_dir):
            fs.delete(jfinal, True)
        # Last-instant re-check: a twin may have COMPLETED final_dir
        # between the guard above and the rename — renaming onto a
        # completed dir would nest tmp inside it (and still return
        # true on HDFS move-into semantics), corrupting the cache for
        # every subsequent reader. Losing the race means our tmp is
        # garbage, full stop.
        if is_materialized(spark, final_dir):
            fs.delete(jtmp, True)
            return final_dir
        renamed = fs.rename(jtmp, jfinal)
        if not renamed:
            if is_materialized(spark, final_dir):
                fs.delete(jtmp, True)  # lost the race to a completed twin
            else:
                raise IOError(
                    f"rename {tmp} -> {final_dir} failed with no "
                    "completed materialization present"
                )
        else:
            # The re-check window cannot be closed entirely (HDFS has
            # no atomic rename-if-absent): if a twin still slipped in,
            # our rename landed tmp INSIDE the completed dir. Detect
            # and remove the nested orphan so readers never see a
            # doubled corpus.
            nested = jvm.org.apache.hadoop.fs.Path(
                final_dir + "/" + os.path.basename(tmp)
            )
            if fs.exists(nested):
                fs.delete(nested, True)
    except Exception:
        if is_materialized(spark, final_dir):
            pass  # a concurrent writer completed; our tmp is garbage
        elif os.path.isdir(tmp) and not os.path.exists(final_dir):
            os.rename(tmp, final_dir)  # local-path fallback
        else:
            raise
    return final_dir


def cached_parquet(
    spark: SparkSession,
    kind: str,
    input_paths: list[str],
    producer: Callable[[], DataFrame],
) -> DataFrame:
    """The one-call form the suite queries use: content-keyed cache
    location + idempotent materialization + parquet scan."""
    final_dir = cache_path(kind, *input_paths)
    ensure_materialized(spark, final_dir, producer)
    return spark.read.parquet(final_dir)
