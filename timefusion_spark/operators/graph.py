"""Connected components over a pair graph — turns near-duplicate PAIRS
into duplicate CLUSTERS (the step a real dedup pipeline needs before it
can pick one survivor per group).

Beyond-the-reference operator (the reference ships no graph machinery);
the input is any (src, dst) edge DataFrame, e.g. the output of
``operators.dedup.minhash_lsh_pairs``.

Algorithm: iterative min-label propagation. Each node starts labeled
with itself; every round each node takes the min of its own label and
its neighbors' labels; fixpoint = components. Convergence is detected
with a one-scalar CHANGED-ROW count — type-agnostic (a sum-of-labels
probe returns NULL for string node ids, which would read as converged
after one round; review r11) and still no driver-side data
materialization. Rounds = graph diameter + 1 (the confirming
zero-changed round); near-dup clusters are shallow
(pairs/stars), so 2-4 rounds in practice. Each round is one shuffled
join + one aggregate, and lineage is truncated per round with
localCheckpoint so plans stay O(1) deep. A graph deeper than
``max_iter`` RAISES instead of returning silently-partial components
(a split keyed on partial components would certify zero leakage while
real leakage exists).

At 100 TB the diameter-bound loop is the right baseline; for adversarial
long-chain graphs the known upgrade is large-star/small-star halving
(same join primitive, O(log n) rounds) — the per-round shape below is
exactly that primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Return (node, component) where ``component`` is the minimum node id
    reachable from ``node`` over the undirected edge set."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.localCheckpoint(eager=True)

    labels = und.select(F.col("a").alias("n")).distinct().withColumn(
        "component", F.col("n")
    )
    labels = labels.localCheckpoint(eager=True)
    # max_iter + 1: convergence needs diameter rounds to propagate PLUS
    # one confirming round observing changed == 0 — with exactly max_iter
    # iterations a graph of diameter == max_iter raised despite being
    # fully converged (review r13)
    for _ in range(max_iter + 1):
        nbr_min = (
            und.join(labels, und["b"] == labels["n"])
            .groupBy(und["a"].alias("n2"))
            .agg(F.min("component").alias("_nbr"))
        )
        staged = (
            labels.join(nbr_min, labels["n"] == nbr_min["n2"], "left")
            .select(
                "n",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = staged.where(F.col("component") != F.col("_old")).count()
        labels = staged.drop("_old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "label-propagation rounds (graph diameter exceeds max_iter); "
            "raise max_iter — returning partial components would "
            "silently split clusters"
        )
    return labels
