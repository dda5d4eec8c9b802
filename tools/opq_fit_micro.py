"""Deterministic driver-side microbench of the OPQ fit: pre-298db05
(cold inner inits + batched (m, n, ksub) assignment temporaries) vs HEAD
(warm-started inner fits + per-subspace GEMMs into reused buffers).

Runs BOTH implementations' numpy fit bodies over the REAL embeddings
corpus sample at the q_ann_opq_adc shape (m=16, ksub=32), no Spark.
Also asserts _np_assign_codes bit-equality given identical inputs —
the part of 298db05 that must be an identity (the warm-start part is
allowed to move codebooks; its gate is the oracle, which stayed green
at sf0.001/0.01/0.1 for pq/opq/ivfpq/ivfopq).

Usage: python tools/opq_fit_micro.py [sf_dir] [old_git_rev]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M, KSUB = 16, 32  # q_ann_opq_adc's fit shape
OPQ_ITERS, PQ_ITERS = 10, 4


def load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def fit_np(mod, X, m, ksub, opq_iters, pq_iters):
    """The opq_fit driver body (rotation alternation) run directly over
    an in-memory sample — identical math to the Spark path after the
    sample collect, old and new modules alike."""
    n, d = X.shape
    dsub = d // m
    R = np.eye(d)
    books = None
    for _ in range(opq_iters):
        Y = X @ R.T
        if books is not None and "init_books" in mod._opq_pq_fit_np.__code__.co_varnames:
            books = mod._opq_pq_fit_np(Y, m, dsub, ksub, pq_iters, init_books=books)
        else:
            books = mod._opq_pq_fit_np(Y, m, dsub, ksub, pq_iters)
        S = Y.reshape(len(Y), m, dsub)
        codes = mod._np_assign_codes(S, books)
        Yh = np.stack([books[j][codes[:, j]] for j in range(m)], axis=1).reshape(n, d)
        U, _s, Vt = np.linalg.svd(X.T @ Yh)
        R_new = (U @ Vt).T
        if np.allclose(R_new, R, atol=1e-12):
            break
        R = R_new
    return R, mod._opq_pq_fit_np(X @ R.T, m, dsub, ksub, pq_iters)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "609c3aa"

    new = load("sim_new", os.path.join(REPO, "timefusion_spark/operators/similarity.py"))
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{old_rev}:timefusion_spark/operators/similarity.py"],
        text=True,
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(src)
        old_path = fh.name
    try:
        old = load("sim_old", old_path)
    finally:
        os.unlink(old_path)

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    X = np.asarray(emb["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
    n, d = X.shape
    print(f"sample: {n} vectors, d={d}, m={M}, ksub={KSUB}")

    # 1) assignment-kernel bit-equality on identical inputs
    dsub = d // M
    S = (X @ np.eye(d).T).reshape(n, M, dsub)
    rng_books = old._opq_pq_fit_np(S.reshape(n, d), M, dsub, KSUB, 1)
    codes_old = old._np_assign_codes(S, rng_books)
    codes_new = new._np_assign_codes(S, np.asarray(rng_books))
    print("assign codes bit-identical:", bool((codes_old == codes_new).all()))
    assert (codes_old == codes_new).all()

    # 2) interleaved full-fit timing
    to, tn = [], []
    for rep in range(5):
        t0 = time.perf_counter()
        fit_np(old, X, M, KSUB, OPQ_ITERS, PQ_ITERS)
        to.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fit_np(new, X, M, KSUB, OPQ_ITERS, PQ_ITERS)
        tn.append(time.perf_counter() - t0)
    print("old reps:", " ".join(f"{x:.3f}" for x in to))
    print("new reps:", " ".join(f"{x:.3f}" for x in tn))
    print(f"min old {min(to):.3f}s  min new {min(tn):.3f}s  speedup(min) {min(to)/min(tn):.2f}x")


if __name__ == "__main__":
    main()
