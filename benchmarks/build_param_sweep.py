"""Sweep the graph build's pool-search params (BuildSearchL/BuildSearchIters).

The pool beam-search stage is the build's linear cost (~0.2 ms/row at
128-d); this measures whether a shorter/narrower per-node search buys
build time without giving up query recall — each config builds the graph,
then the SAME query protocol as bench.py (pipelined batches, exact
re-rank) scores QPS + recall@10 against a blocked host oracle.

Env: SWEEP_N (default 500_000), SWEEP_DIM (128), SWEEP_CONFIGS
(semicolon list "L,iters", default "64,24;48,16;32,12;24,8"),
SWEEP_GT (optional .npy/.npz ground-truth cache — data is deterministic
per N/dim/seed, so a cache from an earlier run with the same shape is
valid; recomputed on host when absent).
Appends one JSON line per config to stdout.
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

    n = int(os.environ.get("SWEEP_N", 500_000))
    dim = int(os.environ.get("SWEEP_DIM", 128))
    k, n_queries, batch = 10, 8192, 2048
    cfg_str = os.environ.get("SWEEP_CONFIGS", "64,24;48,16;32,12;24,8")
    configs = [tuple(int(v) for v in c.split(","))
               for c in cfg_str.split(";")]

    calib = relay_calibration()
    x, queries = make_clustered(n, dim, n_queries)
    xn = (x ** 2).sum(1)
    gt = None
    gt_path = os.environ.get("SWEEP_GT", "")
    if gt_path and os.path.exists(gt_path):
        if gt_path.endswith(".npz"):
            with np.load(gt_path, allow_pickle=False) as z:
                cand = z["gt"]
                if int(z["n"]) != n or int(z["dim"]) != dim:
                    cand = None
        else:
            cand = np.load(gt_path)
        if cand is not None and cand.shape == (n_queries, k):
            gt = cand
            log(f"ground-truth cache hit: {gt_path}")
        else:
            log("ground-truth cache mismatch; recomputing")
    if gt is None:
        gt = blocked_ground_truth(x, xn, queries, k)
    seg, _ = make_bench_segment(n, dim, x)
    valid = seg.valid_mask()

    for (sl, it) in configs:
        global_config.build_search_l = sl
        global_config.build_search_iters = it
        t0 = time.perf_counter()
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        build_s = time.perf_counter() - t0
        table = make_shim(seg, graph)

        ids_all, _ = run_batches(table, queries, valid,
                                 MetricType.EUCLIDEAN, k, batch,
                                 collect_ids=True)  # warmup + recall
        hits = 0
        for bi, s in enumerate(range(0, n_queries, batch)):
            ids = ids_all[bi]
            for i in range(ids.shape[0]):
                hits += len(set(ids[i].tolist()) & set(gt[s + i].tolist()))
        recall = hits / (n_queries * k)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_batches(table, queries, valid, MetricType.EUCLIDEAN, k,
                        batch)
            runs.append(n_queries / (time.perf_counter() - t0))
        row = {"n": n, "dim": dim, "search_l": sl, "search_iters": it,
               "build_s": round(build_s, 1),
               "qps": round(float(np.median(runs)), 1),
               "recall_at_10": round(recall, 4), **calib}
        log(str(row))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
