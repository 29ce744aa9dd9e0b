"""Write the bench.py dataset (same seed/generator) as raw binary files
for the reference-core C++ baseline harness (ref_core_bench.cpp).

Usage: python benchmarks/make_bench_data.py <outdir> [n] [dim] [nq] [k]
Writes data.bin (f32 NxD), queries.bin (f32 QxD), gt.bin (i64 QxK).
"""
import sys

import numpy as np


def make_dataset(n, dim, n_queries, seed=0):
    """Identical generator to bench.py:38-43 (clustered SIFT-like)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3000, dim)) * 2
    x = (centers[rng.integers(0, 3000, n)]
         + rng.normal(size=(n, dim))).astype(np.float32)
    queries = (x[rng.integers(0, n, n_queries)]
               + 0.1 * rng.normal(size=(n_queries, dim))).astype(np.float32)
    return x, queries


def exact_topk(x, queries, k, block=128):
    n_queries = queries.shape[0]
    gt = np.empty((n_queries, k), dtype=np.int64)
    xn = (x ** 2).sum(1)
    for s in range(0, n_queries, block):
        q = queries[s:s + block]
        d = (q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T) + xn[None, :]
        part = np.argpartition(d, k, axis=1)[:, :k]
        row_d = np.take_along_axis(d, part, axis=1)
        gt[s:s + block] = np.take_along_axis(
            part, np.argsort(row_d, axis=1), axis=1)
    return gt


def main():
    outdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    x, queries = make_dataset(n, dim, nq)
    gt = exact_topk(x, queries, k)
    x.tofile(outdir + "/data.bin")
    queries.tofile(outdir + "/queries.bin")
    gt.tofile(outdir + "/gt.bin")
    print(f"wrote {outdir}: n={n} dim={dim} nq={nq} k={k}")


if __name__ == "__main__":
    main()
