"""Sweep beam-search expand (picks per iteration) at fixed compaction.

BeamCompact caps gathered rows per iteration at 96 regardless of expand,
so a larger expand may cut the ITERATION COUNT (more of the frontier
expanded per step) at roughly constant per-iteration gather cost — the
r2b finding that "expand > 4 adds per-iter cost without recall gain"
predates compaction. Uses the cached 500k x 128 graph.

Env: SW_GRAPH (graph cache path), SW_N (500000), SW_DIM (128).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (device_ground_truth, log, make_bench_segment,
                   make_clustered, make_shim, run_batches)  # noqa: E402


def main():
    import vectordb_tpu  # noqa: F401
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("SW_N", 500_000))
    dim = int(os.environ.get("SW_DIM", 128))
    nq, k, batch = 8192, 10, 2048
    x, queries = make_clustered(n, dim, nq)
    seg, _ = make_bench_segment(n, dim, x)
    graph = GraphIndex.load(os.environ["SW_GRAPH"], seg, "V")
    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    gt = device_ground_truth(x, seg.dense_norms["V"][:n], queries, k)

    results = []
    for expand, compact in ((4, 96), (6, 96), (8, 96), (8, 128), (6, 0)):
        global_config.beam_expand = expand
        global_config.beam_compact = compact
        ids_all, _ = run_batches(table, queries, valid,
                                 MetricType.EUCLIDEAN, k, batch,
                                 collect_ids=True)  # warm + recall
        hits = 0
        for bi, s in enumerate(range(0, nq, batch)):
            ids = ids_all[bi]
            for i in range(ids.shape[0]):
                hits += len(set(ids[i, :k].tolist()) & set(gt[s + i]))
        rec = hits / (nq * k)
        runs = []
        for _ in range(3):
            t0 = time.time()
            run_batches(table, queries, valid, MetricType.EUCLIDEAN, k,
                        batch)
            runs.append(nq / (time.time() - t0))
        qps = float(np.median(runs))
        results.append({"expand": expand, "compact": compact,
                        "qps": round(qps, 1), "recall": round(rec, 4)})
        log(f"expand={expand} compact={compact}: {qps:8.0f} qps "
            f"recall={rec:.4f}")
    global_config.beam_expand = 4
    global_config.beam_compact = 96
    print(json.dumps(results))


if __name__ == "__main__":
    main()
