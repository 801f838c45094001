"""Thread-safety stress: concurrent readers through the QueryServer and
a same-handle writer racing readers under read_consistency_interval=0.
The reference gets this from Rust ownership + tokio; here the shared
caches (searchers, FTS indexes, fragment batch cache, hydration cache)
must tolerate ThreadingHTTPServer request threads (SURVEY §5 race
detection: MVCC + cache invalidation under the refresh lock)."""

import threading

import numpy as np

import lancedb_tpu
from lancedb_tpu.remote import connect_remote
from lancedb_tpu.remote.server import QueryServer


def test_concurrent_reads_through_server():
    rng = np.random.default_rng(0)
    db = lancedb_tpu.connect("memory://conc-r")
    t = db.create_table("s", [
        {"id": i, "cat": i % 5, "text": f"word{i % 37} common",
         "vector": list(rng.standard_normal(8).astype(float))}
        for i in range(1200)
    ], mode="overwrite")
    t.create_index(index_type="IVF_PQ", num_partitions=4, num_sub_vectors=4)
    t.create_fts_index("text")
    errs = []
    with QueryServer(db) as server:
        client = connect_remote(server.url, api_key=None)
        rt = client.open_table("s")

        def worker(wid):
            try:
                for i in range(6):
                    q = rng.standard_normal(8).astype(np.float32)
                    assert len(rt.search(q).limit(5).to_list()) == 5
                    r = rt.search(q).where("cat = 2").refine_factor(2).limit(4).to_list()
                    assert all(x["cat"] == 2 for x in r)
                    rt.search(f"word{i % 37}", query_type="fts").limit(3).to_list()
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append((wid, repr(e)))

        threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
        [th.start() for th in threads]
        [th.join() for th in threads]
    assert not errs, errs[:3]


def test_writer_racing_readers_same_handle():
    rng = np.random.default_rng(1)
    db = lancedb_tpu.connect("memory://conc-w", read_consistency_interval=0)
    t = db.create_table("w", [
        {"id": i, "cat": i % 5, "vector": list(rng.standard_normal(8).astype(float))}
        for i in range(500)
    ], mode="overwrite")
    t.create_index(index_type="IVF_FLAT", num_partitions=4)
    errs = []
    stop = threading.Event()

    def writer():
        # numpy Generators are not thread-safe: each thread gets its own
        # (sharing one across the 4 threads was test-local UB under load)
        wrng = np.random.default_rng(100)
        try:
            nxt = 500
            while not stop.is_set():
                t.add([{"id": nxt + j, "cat": (nxt + j) % 5,
                        "vector": list(wrng.standard_normal(8).astype(float))}
                       for j in range(25)])
                nxt += 25
        except Exception as e:  # pragma: no cover
            errs.append(("writer", repr(e)))

    def reader(wid):
        rrng = np.random.default_rng(200 + wid)
        try:
            for _ in range(8):
                q = rrng.standard_normal(8).astype(np.float32)
                assert len(t.search(q).limit(5).to_list()) == 5
                r = t.search(q).where("cat = 1").limit(3).to_list()
                assert all(x["cat"] == 1 for x in r)
        except Exception as e:  # pragma: no cover
            errs.append((wid, repr(e)))

    w = threading.Thread(target=writer)
    rs = [threading.Thread(target=reader, args=(i,)) for i in range(3)]
    w.start()
    [r.start() for r in rs]
    [r.join() for r in rs]
    stop.set()
    w.join()
    assert not errs, errs[:3]
    assert t.count_rows() >= 500
