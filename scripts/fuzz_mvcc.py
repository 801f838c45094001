"""Model-based MVCC fuzzer: a random sequence of table mutations runs
against BOTH a Table and a plain-python oracle (dict id→row). After
every committed operation the live contents must match the oracle as a
row multiset, and at the end every recorded version must check out to
exactly the snapshot the oracle had at that point (time travel).

Ops: add, delete-by-predicate, update, merge_insert (upsert +
delete-missing), compact/prune (content-neutral), tag + checkout.

Usage: python scripts/fuzz_mvcc.py [n_ops] [seed]
"""
from __future__ import annotations

import random
import sys

import numpy as np
import pyarrow as pa


def rows_of(table) -> set[tuple]:
    t = table.to_arrow().select(["id", "val", "cat"])
    return set(zip(
        t.column("id").to_pylist(),
        t.column("val").to_pylist(),
        t.column("cat").to_pylist(),
    ))


def oracle_rows(oracle: dict) -> set[tuple]:
    return {(i, v["val"], v["cat"]) for i, v in oracle.items()}


def fuzz(n_ops: int, seed: int, verbose: bool = False) -> list[str]:
    import lancedb_tpu

    rng = random.Random(seed)
    db = lancedb_tpu.connect("memory://mvcc-fuzz")
    oracle: dict[int, dict] = {i: {"val": f"v{i}", "cat": i % 5} for i in range(50)}
    t = db.create_table("t", [
        {"id": i, **v} for i, v in oracle.items()
    ], mode="overwrite")
    next_id = 50
    snapshots: list[tuple[int, set]] = [(t.version, oracle_rows(oracle))]
    failures: list[str] = []

    def check(opname: str):
        got, want = rows_of(t), oracle_rows(oracle)
        if got != want:
            failures.append(
                f"{opname}: mismatch extra={list(got - want)[:3]} "
                f"missing={list(want - got)[:3]}"
            )

    for step in range(n_ops):
        op = rng.choices(
            ["add", "delete", "update", "merge", "compact", "noopt", "restore"],
            weights=[4, 3, 3, 3, 1, 1, 1], k=1)[0]
        if op == "add":
            n = rng.randint(1, 20)
            batch = []
            for _ in range(n):
                batch.append({"id": next_id, "val": f"v{next_id}", "cat": next_id % 5})
                oracle[next_id] = {"val": f"v{next_id}", "cat": next_id % 5}
                next_id += 1
            t.add(batch)
        elif op == "delete":
            lo = rng.randint(0, max(1, next_id - 1))
            hi = lo + rng.randint(0, 30)
            which = rng.random()
            if which < 0.5:
                pred = f"id >= {lo} AND id < {hi}"
                victims = [i for i in oracle if lo <= i < hi]
            else:
                c = rng.randint(0, 4)
                pred = f"cat = {c} AND id < {lo}"
                victims = [i for i in oracle if oracle[i]["cat"] == c and i < lo]
            t.delete(pred)
            for i in victims:
                del oracle[i]
        elif op == "update":
            c = rng.randint(0, 4)
            tag = f"u{step}"
            t.update(where=f"cat = {c}", values={"val": tag})
            for i, v in oracle.items():
                if v["cat"] == c:
                    v["val"] = tag
        elif op == "merge":
            n = rng.randint(1, 10)
            ids = [rng.randint(0, next_id + 5) for _ in range(n)]
            batch = [{"id": i, "val": f"m{step}", "cat": i % 5} for i in sorted(set(ids))]
            t.merge_insert("id").when_matched_update_all() \
                .when_not_matched_insert_all().execute(batch)
            for row in batch:
                oracle[row["id"]] = {"val": row["val"], "cat": row["cat"]}
            # ids are unique table-wide: never reuse a merged-in id
            next_id = max(next_id, max(row["id"] for row in batch) + 1)
        elif op == "compact":
            t.optimize()
        elif op == "restore":
            # checkout an old version and restore it as the new head
            # (reference table.rs restore): contents revert, history
            # keeps going forward
            version, want = rng.choice(snapshots)
            t.checkout(version)
            t.restore()
            oracle = {i: {"val": v, "cat": c} for i, v, c in want}
            if oracle:
                next_id = max(next_id, max(oracle) + 1)
        elif op == "noopt":
            # prunes every non-latest version: past snapshots are gone
            t.cleanup_old_versions()
            snapshots = [(t.version, oracle_rows(oracle))]
            check(f"step {step} cleanup")
            continue
        check(f"step {step} {op}")
        snapshots.append((t.version, oracle_rows(oracle)))
        if failures and verbose:
            print(failures[-1])
            break

    # time travel: every recorded version must replay its snapshot
    for version, want in rng.sample(snapshots, min(25, len(snapshots))):
        t.checkout(version)
        got = rows_of(t)
        if got != want:
            failures.append(
                f"checkout v{version}: extra={list(got - want)[:3]} "
                f"missing={list(want - got)[:3]}"
            )
    t.checkout_latest()
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = fuzz(n, seed, verbose=True)
    print(f"{n} ops, {len(fails)} failures")
    for f in fails[:10]:
        print("---", f)
    sys.exit(1 if fails else 0)
