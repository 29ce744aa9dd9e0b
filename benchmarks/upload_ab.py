"""A/B: UploadThreads (threaded h2d query uploads) on the grouped path.

Interleaved passes (variant order rotates per pass) cancel relay-weather
drift; reports per-variant median QPS + recall at bench shapes.

Usage: python benchmarks/upload_ab.py [n] [variants...]
  n         table rows (default 100_000)
  variants  UploadThreads values (default: 0 2 4)
Env: AB_PASSES (default 5), AB_GRAPH (graph cache path).
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
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(args[0]) if args else 100_000
    variants = [int(v) for v in args[1:]] or [0, 2, 4]
    passes = int(os.environ.get("AB_PASSES", 5))

    import bench as B
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    dim, k, n_queries, batch = 128, 10, 8192, 2048
    calib = B.relay_calibration()
    x, queries = B.make_clustered(n, dim, n_queries)
    seg, _ = B.make_bench_segment(n, dim, x)
    cache = os.environ.get("AB_GRAPH", "")
    if cache and os.path.exists(cache):
        graph = GraphIndex.load(cache, seg, "V")
        B.log(f"graph cache hit: {cache}")
    else:
        t0 = time.time()
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        B.log(f"build: {time.time() - t0:.1f}s")
        if cache:
            graph.save(cache)

    global_config.query_group_size = 2
    table = B.make_shim(seg, graph)
    valid = seg.valid_mask()
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    B.log(f"tuned: {tuned.get('V', {})}")
    run = B.make_runner(table, queries, valid, MetricType.EUCLIDEAN, k,
                        batch, "grouped")

    # Warmup + recall (gt only over first 1024 queries to bound host time)
    xn = (x ** 2).sum(1)
    gt = B.blocked_ground_truth(x, xn, queries[:1024], k)
    ids_all, _ = run(collect_ids=True)
    ids = np.concatenate(ids_all)[:1024]
    rec = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                   for a, b in zip(ids, gt)])
    B.log(f"recall@10 (1024q): {rec:.4f}")

    results = {v: [] for v in variants}
    for p in range(passes):
        order = variants[p % len(variants):] + variants[:p % len(variants)]
        for v in order:
            global_config.upload_threads = v
            t0 = time.perf_counter()
            run()
            qps = n_queries / (time.perf_counter() - t0)
            results[v].append(qps)
            B.log(f"pass {p} UploadThreads={v}: {qps:.0f} qps")
    out = {"metric": f"upload_ab_{n // 1000}k", "recall": round(float(rec), 4),
           "passes": passes, **calib}
    for v in variants:
        out[f"qps_up{v}"] = round(float(np.median(results[v])), 1)
        out[f"runs_up{v}"] = [round(r) for r in results[v]]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
