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
truncate each other's live checkpoints. A crashed/SIGKILLed process
never reaches ``atexit``, so on first use each process also REAPS
sibling ``pdi_scratch_<uid>_<pid>`` roots whose pid is no longer
alive (``os.kill(pid, 0)`` probe) — stale roots from abnormal exits
are bounded to the dead processes since the last live invocation
instead of accumulating forever (r10 ADVICE).

The root is derived LAZILY on each `scratch_dir` call and re-derived
whenever ``os.getpid()`` differs from the pid it was captured under
(r11 ADVICE): a process that forks after import (multiprocessing,
pytest ``os.fork``) must NOT share the parent's root, or a child's
scratch writes get wiped by the parent's atexit / sibling reuse of
the same lane name. The atexit hook is likewise pid-guarded, so a
registration inherited across ``fork`` never removes the parent's
live root from the child's exit.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

_ROOT: str | None = None
_ROOT_PID: int | None = None


def _cleanup(root: str, owner_pid: int) -> None:
    # inherited across fork: only the registering process cleans up
    if os.getpid() == owner_pid:
        shutil.rmtree(root, ignore_errors=True)


def _root() -> str:
    """The per-process scratch root, (re)derived for the CURRENT pid.
    First use in a process (including a forked child) reaps dead
    siblings and registers the pid-guarded atexit cleanup."""
    global _ROOT, _ROOT_PID
    pid = os.getpid()
    if _ROOT is None or _ROOT_PID != pid:
        _ROOT = os.path.join(
            tempfile.gettempdir(), f"pdi_scratch_{os.getuid()}_{pid}"
        )
        _ROOT_PID = pid
        _reap_stale_roots(_ROOT)
        atexit.register(_cleanup, _ROOT, pid)
    return _ROOT


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else — leave it
    except Exception:
        return True  # unknown — err on the side of not deleting
    return True


def _reap_stale_roots(own_root: str) -> None:
    """Remove sibling scratch roots left by crashed processes (their
    atexit never ran). Only this uid's roots are candidates, and only
    when their pid is provably dead — a live concurrent gate/oracle
    process keeps its root."""
    prefix = f"pdi_scratch_{os.getuid()}_"
    tmp = tempfile.gettempdir()
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith(prefix) or entry == os.path.basename(own_root):
            continue
        try:
            pid = int(entry[len(prefix):])
        except ValueError:
            continue
        if not _pid_alive(pid):
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)


def scratch_dir(name: str, *tags: str) -> str:
    """A fresh, fixed scratch directory for `name` (extra `tags` —
    e.g. the sf_dir — are hashed into the path so distinct corpora
    don't collide). Existing content from a previous invocation in
    this process is removed; the whole root is removed at exit."""
    root = _root()
    suffix = (
        "_" + hashlib.md5("\x1f".join(tags).encode()).hexdigest()[:12]
        if tags
        else ""
    )
    path = os.path.join(root, f"{name}{suffix}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path
