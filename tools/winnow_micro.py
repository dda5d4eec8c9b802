"""Deterministic single-thread microbench + bit-equality check of the
winnow seed kernel: per-document loop (pre-c7a5704) vs vectorized (HEAD).

Runs both kernels over the REAL documents corpus (normalized exactly as
the operator does), in the pandas-batch shape mapInPandas feeds them.
No Spark and no parallelism, so the numbers are insensitive to the
box's core-level contention; interleaved reps + min-of-N calibrate out
its steal waves. Evidence recorded in plans/r14/winnow_kernel_micro.txt.

Usage: python tools/winnow_micro.py [sf_dir] [old_git_rev]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K, W = 20, 8  # substring_dedup defaults — the headline query's shape
REPS = 10


def load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "298db05"

    new = load("dedup_new", os.path.join(REPO, "timefusion_spark/operators/dedup.py"))
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{old_rev}:timefusion_spark/operators/dedup.py"],
        text=True,
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(src)
        old_path = fh.name
    try:
        old = load("dedup_old", old_path)
    finally:
        os.unlink(old_path)

    df = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    # operator-identical normalization: trim, collapse whitespace, lower
    df["_s"] = (
        df["text"].fillna("").str.strip().str.replace(r"\s+", " ", regex=True).str.lower()
    )
    pdf = pd.DataFrame({"_id": df["doc_id"].values, "_s": df["_s"].values})
    chars = int(pdf["_s"].str.len().sum())
    print(f"corpus: {len(pdf)} docs, {chars} normalized chars, mean {chars/len(pdf):.0f}")

    batches = [pdf.iloc[i : i + 10000] for i in range(0, len(pdf), 10000)]

    def run(kernel_builder, collect=False):
        fn = kernel_builder(K, W)
        outs = []
        t0 = time.perf_counter()
        for b in batches:
            for out in fn(iter([b])):
                if collect:
                    outs.append(out)
        return time.perf_counter() - t0, outs

    # bit-equality first (also warms both paths)
    _, o_old = run(old._winnow_seed_kernel, collect=True)
    _, o_new = run(new._winnow_seed_kernel, collect=True)
    a = pd.concat(o_old, ignore_index=True).sort_values(["_id", "_pos"]).reset_index(drop=True)
    b = pd.concat(o_new, ignore_index=True).sort_values(["_id", "_pos"]).reset_index(drop=True)
    same = (
        len(a) == len(b)
        and (a["_id"].values == b["_id"].values).all()
        and (
            np.asarray(a["_pos"], dtype=np.int64) == np.asarray(b["_pos"], dtype=np.int64)
        ).all()
        and (a["_gram"].values == b["_gram"].values).all()
    )
    print(f"rows: old={len(a)} new={len(b)} bit-identical={same}")
    assert same, "kernel outputs diverge — DO NOT ship"

    to, tn = [], []
    for _ in range(REPS):
        to.append(run(old._winnow_seed_kernel)[0])
        tn.append(run(new._winnow_seed_kernel)[0])
    print("old reps:", " ".join(f"{x:.3f}" for x in to))
    print("new reps:", " ".join(f"{x:.3f}" for x in tn))
    print(f"min old {min(to):.3f}s  min new {min(tn):.3f}s  speedup(min) {min(to)/min(tn):.2f}x")
    mo, mn = sorted(to)[len(to) // 2], sorted(tn)[len(tn) // 2]
    print(f"median old {mo:.3f}s  median new {mn:.3f}s  speedup(med) {mo/mn:.2f}x")


if __name__ == "__main__":
    main()
