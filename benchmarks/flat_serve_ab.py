"""Interleaved A/B at 100k: flat-serve vs graph-fused vs graph-split.

Relay weather swings QPS ±2x across hours (r4/r5 measurements), so mode
comparisons are only valid INTERLEAVED in one window, each pass tagged
with the fixed-work probe for normalization (bench.py's protocol).
Also sweeps QueryGroupSize for the flat mode (one 8192-query super-chunk
vs 2/4 overlapping chunks).

Run on the real chip: python benchmarks/flat_serve_ab.py
Env: AB_N (default 100000), AB_TRIALS (default 4).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOMINAL_WORK_MS = 30.0


def main():
    import vectordb_tpu  # noqa: F401
    from bench import (make_bench_segment, make_clustered, make_shim,
                       quick_work_ms, relay_calibration)
    from vectordb_tpu.config import global_config as gc
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("AB_N", 100_000))
    trials = int(os.environ.get("AB_TRIALS", 4))
    dim, k, nq, batch = 128, 10, 8192, 2048
    calib = relay_calibration()
    x, queries = make_clustered(n, dim, nq)
    seg, _ = make_bench_segment(n, dim, x)
    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    print(f"tuned: {tuned.get('V', {})}", file=sys.stderr, flush=True)

    modes = [
        ("flat_g4", {"flat_serve": "auto", "query_group_size": 4}),
        ("flat_g2", {"flat_serve": "auto", "query_group_size": 2}),
        ("flat_g1", {"flat_serve": "auto", "query_group_size": 1}),
        ("graph_fused_g2", {"flat_serve": "off", "query_group_size": 2,
                            "fused_traversal": "auto"}),
        ("graph_split_g2", {"flat_serve": "off", "query_group_size": 2,
                            "fused_traversal": "off"}),
    ]

    def set_mode(cfg):
        for a, v in cfg.items():
            setattr(gc, a, v)

    # warmup + recall per mode (untimed; compiles)
    from bench import blocked_ground_truth
    xn = (x ** 2).sum(1)
    gt = blocked_ground_truth(x, xn, queries, k)
    recalls = {}
    for name, cfg in modes:
        set_mode(cfg)
        ids, _ = table.grouped_dense_search("V", queries, valid,
                                            MetricType.EUCLIDEAN, k,
                                            batch=batch, mask_cacheable=True)
        hits = sum(len(set(ids[i].tolist()) & set(gt[i].tolist()))
                   for i in range(nq))
        recalls[name] = hits / (nq * k)
        print(f"{name}: recall {recalls[name]:.4f} (warm)",
              file=sys.stderr, flush=True)

    results = {name: [] for name, _ in modes}
    for t in range(trials):
        for name, cfg in modes:
            set_mode(cfg)
            work = quick_work_ms()
            t0 = time.time()
            table.grouped_dense_search("V", queries, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            dt = time.time() - t0
            qps = nq / dt
            results[name].append((qps, work))
            print(f"trial {t} {name}: {dt*1e3:.0f} ms -> {qps:.0f} qps "
                  f"(work {work:.1f} ms, norm "
                  f"{qps*work/NOMINAL_WORK_MS:.0f})",
                  file=sys.stderr, flush=True)

    out = {"n": n, "trials": trials, **calib}
    for name, rs in results.items():
        out[name] = {
            "qps_med": round(float(np.median([q for q, _ in rs])), 1),
            "qps_norm_med": round(float(np.median(
                [q * w / NOMINAL_WORK_MS for q, w in rs])), 1),
            "recall": round(recalls[name], 4),
            "runs": [round(q) for q, _ in rs],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
