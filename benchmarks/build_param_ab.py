"""A/B query-throughput test of graphs built with different pool-search
params, with INTERLEAVED timed passes (A,B,A,B,...) so relay drift between
runs cannot masquerade as a graph-quality difference (observed: 20-35%
QPS swings between back-to-back identical runs).

Env: AB_N (default 500_000), AB_DIM (960), AB_CONFIGS ("64,24;24,8"),
AB_PASSES (5 per config), AB_DATA ("clustered" | "uniform"), SWEEP_GT
(optional gt cache, same as build_param_sweep). Prints one JSON line per
config.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (log, make_bench_segment, make_clustered, make_shim,  # noqa: E402
                   blocked_ground_truth, relay_calibration, run_batches)


def main():
    import vectordb_tpu  # noqa: F401
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("AB_N", 500_000))
    dim = int(os.environ.get("AB_DIM", 960))
    passes = int(os.environ.get("AB_PASSES", 5))
    k, n_queries, batch = 10, 8192, 2048
    configs = [tuple(int(v) for v in c.split(","))
               for c in os.environ.get("AB_CONFIGS", "64,24;24,8").split(";")]

    calib = relay_calibration()
    data_kind = os.environ.get("AB_DATA", "clustered")
    if data_kind == "uniform":
        # Uniform gaussian: no cluster structure, the hardest regime for
        # graph recall (every neighborhood looks alike) — validates that a
        # pool-search policy tuned on clustered data doesn't degrade here.
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n, dim)).astype(np.float32)
        queries = (x[rng.integers(0, n, n_queries)]
                   + 0.1 * rng.normal(size=(n_queries, dim)).astype(np.float32))
    else:
        x, queries = make_clustered(n, dim, n_queries)
    xn = (x ** 2).sum(1)
    gt = None
    gt_path = os.environ.get("SWEEP_GT", "")
    # Shape alone can't distinguish ground truth computed from a different
    # data distribution — require the data kind in the cache filename so a
    # clustered-run cache is never scored against uniform data.
    if (gt_path and os.path.exists(gt_path)
            and data_kind in os.path.basename(gt_path)):
        cand = np.load(gt_path)
        if cand.shape == (n_queries, k):
            gt = cand
            log(f"ground-truth cache hit: {gt_path}")
    if gt is None:
        gt = blocked_ground_truth(x, xn, queries, k)
    seg, _ = make_bench_segment(n, dim, x)
    valid = seg.valid_mask()

    tables, builds = [], []
    for (sl, it) in configs:
        global_config.build_search_l = sl
        global_config.build_search_iters = it
        t0 = time.perf_counter()
        g = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        builds.append(time.perf_counter() - t0)
        tables.append(make_shim(seg, g))

    recalls = []
    for t in tables:  # warmup + recall, untimed
        ids_all, _ = run_batches(t, queries, valid, MetricType.EUCLIDEAN,
                                 k, batch, collect_ids=True)
        hits = 0
        for bi, s in enumerate(range(0, n_queries, batch)):
            ids = ids_all[bi]
            for i in range(ids.shape[0]):
                hits += len(set(ids[i].tolist()) & set(gt[s + i].tolist()))
        recalls.append(hits / (n_queries * k))

    runs = [[] for _ in tables]  # interleaved: A,B,A,B,...
    for _ in range(passes):
        for ci, t in enumerate(tables):
            t0 = time.perf_counter()
            run_batches(t, queries, valid, MetricType.EUCLIDEAN, k, batch)
            runs[ci].append(n_queries / (time.perf_counter() - t0))

    for ci, (sl, it) in enumerate(configs):
        print(json.dumps({
            "n": n, "dim": dim, "search_l": sl, "search_iters": it,
            "build_s": round(builds[ci], 1),
            "qps": round(float(np.median(runs[ci])), 1),
            "qps_runs": [round(r, 1) for r in runs[ci]],
            "recall_at_10": round(recalls[ci], 4), **calib}), flush=True)


if __name__ == "__main__":
    main()
