"""IVF ANN: probe-limited search quality on a pinned layout (k-means init
depends on partition structure, so determinism requires fixing it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timefusion_spark.operators import similarity as sim
from timefusion_spark.queries._tables import t


def test_ivf_recall_on_pinned_layout(spark, sf_dir):
    e = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") != 0)
        .repartition(1)
        .sortWithinPartitions("vec_id")
    )
    qv = list(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    exact = [r["vec_id"] for r in sim.knn_brute_force(e, qv, k=10).collect()]
    approx = [r["vec_id"] for r in sim.knn_ivf(e, qv, k=10, n_probe=6, n_cells=16).collect()]
    # probe-limited search over 6/16 cells: the true top-1 must be found,
    # and recall@10 must clear 50% on this corpus/layout.
    assert approx[0] == exact[0]
    assert len(set(approx) & set(exact)) >= 5

    # every returned similarity is a true cosine (no fabricated scores):
    got = {r["vec_id"]: r["cos_sim"] for r in sim.knn_ivf(e, qv, k=3, n_probe=6).collect()}
    base = {
        r["vec_id"]: r["cos_sim"]
        for r in sim.knn_brute_force(e, qv, k=500).collect()
    }
    for vid, cs in got.items():
        assert abs(base[vid] - cs) < 1e-9


def test_ivf_flat_recall_and_plan(spark, sf_dir):
    """Fixed-quantizer IVF: recall vs exact baseline, and the assignment
    stage must be map-only (no Exchange before the probe filter — the
    centroids ride in the plan as constants)."""
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    qv = list(
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    cents = [
        (int(r[0]), list(r[1]))
        for r in t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id").between(1, 16))
        .select("vec_id", "embedding")
        .collect()
    ]
    exact = [r["vec_id"] for r in sim.knn_brute_force(e, qv, k=10).collect()]
    approx_df = sim.knn_ivf_flat(e, cents, qv, k=10, n_probe=4)
    approx = [r["vec_id"] for r in approx_df.collect()]
    assert approx[0] == exact[0]
    assert len(set(approx) & set(exact)) >= 5

    # map-only assignment: the only wide operator in the plan is the
    # final top-k (TakeOrderedAndProject), never an Exchange for the
    # assignment itself.
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1]
