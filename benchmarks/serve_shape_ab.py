"""Per-group device latency: flat-serve vs tuned graph at the batcher's
bucket sizes, 200k rows (the serving bench shape).

The serving tier coalesces ~63 queries/group under 256-client load and
rounds up to the 128 bucket; flat-serve's whole-table scan is active at
200k (FlatServeMaxRows=262144) and was validated at batch 2048 steady
state — this measures whether it also wins at the SMALL group shapes the
batcher actually dispatches, or whether the cutover needs a batch gate.

Usage: python benchmarks/serve_shape_ab.py [n_rows]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim, k = 128, 10

    import bench as B
    from vectordb_tpu.config import global_config as cfg
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    x, queries = B.make_clustered(n, dim, 4096)
    seg, _ = B.make_bench_segment(n, dim, x)

    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)
    table = B.make_shim(seg, graph)
    valid = seg.valid_mask()
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    print(f"tuned: {tuned.get('V', {})}", file=sys.stderr)

    results = {}
    for batch in (16, 128, 512, 2048):
        per_mode = {}
        for mode in ("graph", "flat"):
            cfg.flat_serve = "off" if mode == "graph" else "auto"
            if batch % 128 and mode == "flat":
                continue  # flat gated off at non-128-multiple buckets
            qs = queries[:batch]
            # group of exactly one batch — the batcher's dispatch shape
            cfg.query_group_size = 1
            table.grouped_dense_search("V", qs, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                table.grouped_dense_search("V", qs, valid,
                                           MetricType.EUCLIDEAN, k,
                                           batch=batch,
                                           mask_cacheable=True)
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3
            per_mode[mode] = round(ms, 1)
            print(f"batch {batch:5d} {mode:5s}: {ms:7.1f} ms/group "
                  f"({batch / ms * 1e3:7.0f} q/s single-stream)",
                  file=sys.stderr)
        results[batch] = per_mode
    cfg.flat_serve = "auto"
    print(json.dumps({"metric": "serve_shape_ab_200k", "n": n,
                      "per_batch_ms": results}))


if __name__ == "__main__":
    main()
