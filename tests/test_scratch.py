"""Process-scoped scratch-root lifecycle: fixed per-name dirs wiped
on reuse, and — the r10 ADVICE case — stale roots left by CRASHED
processes (whose atexit never ran) are reaped on the next live
process's first use, while roots of live pids survive."""

from __future__ import annotations

import os

from patientdataintegration_spark import scratch


def test_scratch_dir_is_fixed_and_wiped_on_reuse():
    p1 = scratch.scratch_dir("unit_test_lane", "tagA")
    marker = os.path.join(p1, "leftover")
    open(marker, "w").write("x")
    p2 = scratch.scratch_dir("unit_test_lane", "tagA")
    assert p1 == p2
    assert not os.path.exists(marker)
    # distinct tags -> distinct dirs (corpora don't collide)
    assert scratch.scratch_dir("unit_test_lane", "tagB") != p1


def test_stale_roots_of_dead_pids_are_reaped(tmp_path, monkeypatch):
    import tempfile

    tmp = str(tmp_path)
    monkeypatch.setattr(tempfile, "gettempdir", lambda: tmp)
    uid = os.getuid()

    # a root from a provably-dead pid (we just reaped this child)
    dead_pid = os.fork()
    if dead_pid == 0:
        os._exit(0)
    os.waitpid(dead_pid, 0)
    dead_root = os.path.join(tmp, f"pdi_scratch_{uid}_{dead_pid}")
    os.makedirs(dead_root)

    # a root from a LIVE pid (this process stands in for a concurrent
    # gate/oracle run) and a non-pid-suffixed name: both must survive
    live_root = os.path.join(tmp, f"pdi_scratch_{uid}_{os.getpid() }")
    os.makedirs(live_root, exist_ok=True)
    odd_root = os.path.join(tmp, f"pdi_scratch_{uid}_notapid")
    os.makedirs(odd_root)

    scratch._reap_stale_roots(os.path.join(tmp, f"pdi_scratch_{uid}_999999999"))

    assert not os.path.exists(dead_root), "dead pid's root must be reaped"
    assert os.path.exists(live_root), "live pid's root must survive"
    assert os.path.exists(odd_root), "non-pid names are not candidates"


def test_forked_child_gets_its_own_root():
    """r11 ADVICE: the root is re-derived per pid, so a fork after
    first use gives the child a DISTINCT root — the parent's atexit
    (and same-name lane reuse) can never wipe the child's scratch."""
    parent_dir = scratch.scratch_dir("fork_lane")
    parent_root = scratch._root()
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child
        os.close(r)
        try:
            child_dir = scratch.scratch_dir("fork_lane")
            ok = (
                scratch._root() != parent_root
                and child_dir != parent_dir
                and os.path.isdir(child_dir)
            )
            os.write(w, b"1" if ok else b"0")
        finally:
            os._exit(0)
    os.close(w)
    got = os.read(r, 1)
    os.close(r)
    os.waitpid(pid, 0)
    assert got == b"1", "forked child must derive its own pid-scoped root"
    # the child's pid-guarded atexit must not have touched the parent root
    assert os.path.isdir(parent_dir)
