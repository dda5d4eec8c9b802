"""Per-query profiling harness for the optimization rounds.

For each named query (default: bench.py's HEADLINE list), runs the same
warm-then-timed methodology as bench.py but additionally records:
  - wall seconds (min of 2 timed runs, after 1 warmup)
  - Spark JOB COUNT per run (statusTracker delta) — the fixed-overhead
    driver cost each query pays regardless of data volume
  - the returned DataFrame's formatted physical plan (written to
    plans/<round>/<query>_<tag>.txt when --plans <tag> is given; the round
    dir defaults to r14 and is overridable with --plans-dir)

Usage: python tools/profile_bench.py [--plans before] [--plans-dir plans/r14] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        args = args[:i] + args[i + 2 :]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    plans_dir_arg = None
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir_arg = args[i + 1]
        args = args[:i] + args[i + 2 :]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from timefusion_spark.session import get_spark

    spark = get_spark("tf-profile")
    qs = entrymod.queries()
    names = args or HEADLINE

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import glob

    from timefusion_spark.queries._tables import t

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        t(spark, sf_dir, os.path.basename(p).removesuffix(".parquet")).selectExpr(
            "count(1)"
        ).collect()

    tracker = spark.sparkContext.statusTracker()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    plans_dir = plans_dir_arg or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            df.collect()  # warmup
            if plans_tag:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            walls, jobs = [], []
            for _ in range(runs):
                j0 = job_count()
                t0 = time.perf_counter()
                n = len(fn(spark, sf_dir).collect())
                walls.append(round(time.perf_counter() - t0, 4))
                jobs.append(job_count() - j0)
            out[name] = {"wall": min(walls), "walls": walls, "jobs": jobs, "rows": n}
            print(
                f"{name:32s} {min(walls):7.3f}s  jobs={jobs}  rows={n}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
            out[name] = {"error": str(e)[:300]}
    path = os.path.join("/tmp", f"profile_{plans_tag or 'run'}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"detail -> {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
