"""Process-scoped scratch directories for lanes with build-time side
effects (persisted Bloom-store generations, streaming checkpoints).

Several lanes write real files at DataFrame-construction time — that
is the point of the lane (q247 replays a persisted store's lifecycle;
the state-store audits read a checkpoint back). A bare
``tempfile.mkdtemp`` per call leaks one directory per gate/bench/
oracle invocation (r9 ADVICE); this helper gives each named consumer
ONE fixed directory under a per-process root that is

- WIPED on reuse (an invocation always starts from a clean slate —
  the lanes rebuild their artifacts deterministically by design), and
- removed at interpreter exit via ``atexit`` (nothing can lazily read
  a plan after the interpreter is gone, so the cleanup is safe).

The root is pid-scoped so concurrent gate/oracle processes never
truncate each other's live checkpoints.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

_ROOT = os.path.join(
    tempfile.gettempdir(), f"pdi_scratch_{os.getuid()}_{os.getpid()}"
)
_CLEANUP_REGISTERED = False


def _cleanup() -> None:
    shutil.rmtree(_ROOT, ignore_errors=True)


def scratch_dir(name: str, *tags: str) -> str:
    """A fresh, fixed scratch directory for `name` (extra `tags` —
    e.g. the sf_dir — are hashed into the path so distinct corpora
    don't collide). Existing content from a previous invocation in
    this process is removed; the whole root is removed at exit."""
    global _CLEANUP_REGISTERED
    if not _CLEANUP_REGISTERED:
        atexit.register(_cleanup)
        _CLEANUP_REGISTERED = True
    suffix = (
        "_" + hashlib.md5("\x1f".join(tags).encode()).hexdigest()[:12]
        if tags
        else ""
    )
    path = os.path.join(_ROOT, f"{name}{suffix}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path
