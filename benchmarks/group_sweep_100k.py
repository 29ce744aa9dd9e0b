"""100k like-for-like QPS lever sweep: group size (G), batch size, and
dispatch-ahead depth for the grouped one-program path.

VERDICT r3 #2: close the per-chip QPS gap toward >=6x the measured C++
reference core (12,596 QPS at 100k) — the engine does ~64k (r4), the
kernel alone 61.6k+ at 500k; the remaining gap is per-program fixed
cost (dispatch + upload + drain through the tunneled relay). This sweep
measures the real knobs at bench shapes before changing defaults.

Usage: python benchmarks/group_sweep_100k.py [n]
Prints one JSON line per configuration.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import bench as B
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    dim, k, n_queries = 128, 10, 8192
    x, queries = B.make_clustered(n, dim, n_queries)
    seg, _ = B.make_bench_segment(n, dim, x)
    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)
    table = B.make_shim(seg, graph)
    valid = seg.valid_mask()
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    print(f"tuned: {tuned.get('V', {})}", file=sys.stderr)

    xn = (x ** 2).sum(1)
    gt = B.blocked_ground_truth(x, xn, queries, k)

    def recall_of(ids_all):
        hits = 0
        for i in range(n_queries):
            hits += len(set(ids_all[i, :k].tolist()) & set(gt[i].tolist()))
        return hits / (n_queries * k)

    configs = []
    for g, batch, ahead in [(2, 2048, 2), (2, 2048, 3), (2, 2048, 4),
                            (4, 2048, 2), (2, 4096, 2), (4, 1024, 2),
                            (4, 1024, 4), (8, 1024, 2)]:
        if g * batch > n_queries:
            continue
        configs.append((g, batch, ahead))

    for g, batch, ahead in configs:
        global_config.query_group_size = g
        global_config.dispatch_ahead = ahead
        # warmup/compile + recall (untimed)
        ids, _ = table.grouped_dense_search("V", queries, valid,
                                            MetricType.EUCLIDEAN, k,
                                            batch=batch,
                                            mask_cacheable=True)
        rec = recall_of(ids)
        qs = []
        for _ in range(3):
            t0 = time.perf_counter()
            table.grouped_dense_search("V", queries, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            qs.append(n_queries / (time.perf_counter() - t0))
        print(json.dumps({"g": g, "batch": batch, "ahead": ahead,
                          "qps": round(float(np.median(qs)), 1),
                          "qps_runs": [round(q, 1) for q in qs],
                          "recall": round(rec, 4)}), flush=True)


if __name__ == "__main__":
    main()
