"""Pointer-doubling path aggregation (operators/hierarchy.py): root-to-
node sums/depths over parent-pointer trees, orphan-subtree handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from timefusion_spark.operators.hierarchy import path_to_root


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "id long, parent_id long, w long")


def test_deep_chain_and_branch(spark):
    # chain 0<-1<-2<-3<-4 plus branch 2<-5; weights = id+1
    rows = [(i, None if i == 0 else i - 1, i + 1) for i in range(5)] + [(5, 2, 6)]
    out = {
        r["id"]: (r["path_sum"], r["depth"], r["_reached_root"])
        for r in path_to_root(_nodes(spark, rows), max_depth=8).collect()
    }
    assert out[0] == (1, 1, True)
    assert out[4] == (1 + 2 + 3 + 4 + 5, 5, True)
    assert out[5] == (1 + 2 + 3 + 6, 4, True)


def test_orphan_subtree_is_flagged(spark):
    # 10's parent (99) does not exist; 11 hangs under 10 — both unreachable.
    rows = [(0, None, 1), (1, 0, 2), (10, 99, 5), (11, 10, 7)]
    out = {r["id"]: r["_reached_root"] for r in path_to_root(_nodes(spark, rows)).collect()}
    assert out == {0: True, 1: True, 10: False, 11: False}


def test_log_rounds_cover_max_depth(spark):
    # depth 33 chain with max_depth=64 → 6 doubling rounds must suffice.
    rows = [(i, None if i == 0 else i - 1, 1) for i in range(33)]
    out = path_to_root(_nodes(spark, rows), max_depth=64)
    deepest = out.where(F.col("id") == 32).first()
    assert deepest["depth"] == 33 and deepest["path_sum"] == 33 and deepest["_reached_root"]


def test_random_forests_match_bruteforce(spark):
    """Property: on random forests (trees + orphan chains), path_to_root
    equals a driver-side reference walk for every node."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        parent = {}
        for i in range(1, n):
            # 10% orphan pointers (to a nonexistent id), else a prior node
            parent[i] = 1000 + i if rng.random() < 0.1 else rng.randrange(0, i)
        parent[0] = None
        w = {i: rng.randrange(1, 9) for i in range(n)}
        rows = [(i, parent[i], w[i]) for i in range(n)]

        def walk(i):
            total, depth, seen = 0, 0, set()
            j = i
            while j is not None and j in w and j not in seen:
                seen.add(j)
                total += w[j]
                depth += 1
                j = parent.get(j)
            return (total, depth, j is None)  # reached root iff chain ended at None

        expected = {i: walk(i) for i in range(n)}
        out = {
            r["id"]: (r["path_sum"], r["depth"], r["_reached_root"])
            for r in path_to_root(_nodes(spark, rows), max_depth=64).collect()
        }
        for i in range(n):
            if expected[i][2]:
                assert out[i] == expected[i], f"trial {trial} node {i}"
            else:
                assert out[i][2] is False, f"trial {trial} node {i} orphan"
