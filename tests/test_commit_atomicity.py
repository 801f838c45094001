"""Atomic manifest commits on cloud stores (reference: object_store
conditional puts + the DynamoDB commit handler, SURVEY.md §2.7).

Fault-injection style: a racy fake filesystem forces the
check-then-write interleaving that loses a version on S3-class stores,
and shows (a) conditional create fixes it, (b) the lock-table commit
handler fixes it for backends without conditional create.
"""

import threading
import time

import pytest

from lancedb_tpu.io.object_store import (
    FsspecStore,
    LockTableCommitHandler,
    MemoryStore,
)


class RacyFs:
    """Duck-typed fsspec-like store whose exists→write window is forced
    open across two racing threads via a barrier."""

    def __init__(self, barrier: threading.Barrier, conditional: bool):
        self.objects = {}
        self.lock = threading.Lock()
        self.barrier = barrier
        self.conditional = conditional

    def exists(self, path):
        present = path in self.objects
        # both racers observe 'absent' before either writes
        try:
            self.barrier.wait(timeout=5)
        except threading.BrokenBarrierError:
            pass
        return present

    def pipe_file(self, path, data, **kw):
        if "mode" in kw:
            if not self.conditional:
                raise TypeError("mode not supported")  # old-backend behavior
            if kw["mode"] == "create":
                with self.lock:
                    if path in self.objects:
                        raise FileExistsError(path)
                    self.objects[path] = bytes(data)
                    return
        with self.lock:
            self.objects[path] = bytes(data)

    def cat_file(self, path, **kw):
        try:
            return self.objects[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def rm_file(self, path):
        self.objects.pop(path, None)


def _make_store(fs, handler=None):
    s = object.__new__(FsspecStore)
    s.fs = fs
    s.scheme = "racy"
    s.commit_handler = handler
    return s


def _race(store, path=b"manifest"):
    wins = []

    def committer(tag):
        ok = store.put_if_absent("v/42.json", b"data-" + tag)
        wins.append(ok)

    t1 = threading.Thread(target=committer, args=(b"a",))
    t2 = threading.Thread(target=committer, args=(b"b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    return wins


def test_check_then_write_loses_a_version():
    """Documents the hazard: without conditional create or a lock table,
    two racing committers can both 'win' (one version silently lost)."""
    fs = RacyFs(threading.Barrier(2), conditional=False)
    wins = _race(_make_store(fs))
    assert wins == [True, True]  # the bug this module exists to prevent


def test_conditional_create_single_winner():
    fs = RacyFs(threading.Barrier(2), conditional=True)
    wins = _race(_make_store(fs))
    assert sorted(wins) == [False, True]


def test_lock_table_handler_single_winner():
    fs = RacyFs(threading.Barrier(2), conditional=False)
    handler = LockTableCommitHandler(MemoryStore(), "locks")
    wins = _race(_make_store(fs, handler))
    assert sorted(wins) == [False, True]
    assert not list(handler.lock_store.list("locks"))  # lock released


def test_lock_table_breaks_stale_lock():
    fs = RacyFs(threading.Barrier(1), conditional=False)
    lock_store = MemoryStore()
    handler = LockTableCommitHandler(lock_store, "locks", ttl_seconds=0.05)
    # a crashed committer left a lock behind
    key = handler._lock_key("v/42.json")
    lock_store.put_if_absent(key, b'{"owner": "dead", "ts": 1.0}')
    t0 = time.time()
    assert _make_store(fs, handler).put_if_absent("v/42.json", b"x") is True
    assert time.time() - t0 < 5


def test_lock_table_via_storage_options(tmp_path):
    """lock_table_uri storage option wires the handler up at resolve time."""
    store = FsspecStore(
        "memory", {"lock_table_uri": str(tmp_path / "locks")}
    )
    assert isinstance(store.commit_handler, LockTableCommitHandler)
    assert store.put_if_absent("race/m1.json", b"a") is True
    assert store.put_if_absent("race/m1.json", b"b") is False
    assert store.read_bytes("race/m1.json") == b"a"


def test_fsspec_memory_conditional_create():
    store = FsspecStore("memory")
    path = f"cc-{time.time_ns()}/m.json"
    assert store.put_if_absent(path, b"first") is True
    assert store.put_if_absent(path, b"second") is False
    assert store.read_bytes(path) == b"first"


def test_dataset_concurrent_commits_both_land(tmp_path):
    """Integration: two concurrent writers on one table — both commits
    must land as DISTINCT versions (rebase loop + atomic create)."""
    import numpy as np
    import pyarrow as pa

    import lancedb_tpu

    db = lancedb_tpu.connect(str(tmp_path / "db"))
    tbl = db.create_table("t", pa.table({"x": pa.array(np.arange(4))}))

    errs = []

    def writer(val):
        try:
            t = db.open_table("t")
            t.add(pa.table({"x": pa.array([val] * 3)}))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    fresh = db.open_table("t")
    assert fresh.count_rows() == 4 + 4 * 3
