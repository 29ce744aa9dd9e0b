"""Interleaved A/B of the wire-pipelining knobs at bench shapes:
UploadThreads x DrainThreads for the grouped one-program path.

Motivation (R4k/R5): the grouped pass at 100k is wire-HANDSHAKE bound —
~4 relay transfers per 8192-query pass (2 query puts + 2 packed drains
at ~27-34 ms handshake each). Puts pipeline across issuing threads
(put_micro.py); fetch_micro.py asks the same of d2h. This A/B measures
the end-to-end effect of threading the drains (DrainThreads) and of
deeper upload pools, INTERLEAVED round-robin so relay drift (R4i saw a
window collapse 58.4k -> 42.7k mid-experiment) hits every config evenly.

Usage: python benchmarks/drain_ab.py [n_rows]
Prints one JSON line per config at the end.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [  # (upload_threads, drain_threads)
    (2, 0),  # r4k default (inline drains)
    (2, 2),
    (4, 2),
    (4, 4),
]
ROUNDS = 5  # passes per config, interleaved


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import bench as B
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    dim, k, n_queries, batch = 128, 10, 8192, 2048
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

    # warmup/compile + recall (untimed; config-independent results are
    # pinned by tests, so score once)
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, k,
                                        batch=batch, mask_cacheable=True)
    hits = sum(len(set(ids[i, :k].tolist()) & set(gt[i].tolist()))
               for i in range(n_queries))
    rec = hits / (n_queries * k)
    print(f"recall: {rec:.4f}", file=sys.stderr)

    runs = {c: [] for c in CONFIGS}
    works = {c: [] for c in CONFIGS}
    for rnd in range(ROUNDS):
        for c in CONFIGS:
            global_config.upload_threads, global_config.drain_threads = c
            w = B.quick_work_ms()
            t0 = time.perf_counter()
            table.grouped_dense_search("V", queries, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            q = n_queries / (time.perf_counter() - t0)
            runs[c].append(q)
            works[c].append(w)
            print(f"round {rnd} up={c[0]} dr={c[1]}: {q:.0f} qps "
                  f"(work {w:.1f} ms)", file=sys.stderr)

    for c in CONFIGS:
        print(json.dumps({
            "upload_threads": c[0], "drain_threads": c[1],
            "qps": round(float(np.median(runs[c])), 1),
            "qps_runs": [round(q, 1) for q in runs[c]],
            "work_ms": [round(w, 1) for w in works[c]],
            "recall": round(rec, 4), "n": n}), flush=True)


if __name__ == "__main__":
    main()
