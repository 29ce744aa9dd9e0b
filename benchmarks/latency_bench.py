"""Single-query and small-batch latency through the full engine path.

BASELINE.json names p50 query latency as a first-class metric; bench.py
reports per-BATCH latency at the throughput batch size (2048). This probes
the other end: one query at a time (the interactive / low-QPS regime) and
a few small batch sizes, so the fixed cost (relay round-trip + fetch) and
the kernel's batch scaling are both visible.

Env: LAT_N (default 500_000), LAT_DIM (128), LAT_GRAPH (graph cache path,
required to skip the build). Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, make_bench_segment, make_clustered, make_shim  # noqa: E402


def main():
    import vectordb_tpu  # noqa: F401
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("LAT_N", 500_000))
    dim = int(os.environ.get("LAT_DIM", 128))
    x, queries = make_clustered(n, dim, 512)
    seg, _ = make_bench_segment(n, dim, x)
    cache = os.environ.get("LAT_GRAPH", "")
    if cache and os.path.exists(cache):
        graph = GraphIndex.load(cache, seg, "V")
    else:
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        if cache:
            graph.save(cache)
    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    k = 10

    out = {"n": n, "dim": dim}
    for b in (1, 16, 128, 512):
        qs = queries[:max(b, 1)]
        # Warmup compiles the bucket shape.
        table.batch_dense_search("V", qs[:b], valid,
                                 MetricType.EUCLIDEAN, k)
        lats = []
        reps = 50 if b <= 16 else 20
        for i in range(reps):
            q = queries[(i * b) % 500: (i * b) % 500 + b]
            if q.shape[0] < b:
                q = queries[:b]
            t0 = time.perf_counter()
            ids, _ = table.batch_dense_search("V", q, valid,
                                              MetricType.EUCLIDEAN, k)
            lats.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lats, 50) * 1e3)
        p99 = float(np.percentile(lats, 99) * 1e3)
        out[f"b{b}_p50_ms"] = round(p50, 1)
        out[f"b{b}_p99_ms"] = round(p99, 1)
        log(f"batch {b:4d}: p50 {p50:7.1f} ms  p99 {p99:7.1f} ms "
            f"({b / (p50 / 1e3):7.0f} qps at p50)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
