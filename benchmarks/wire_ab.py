"""Query-wire dtype x serve-mode A/B at steady state (32k-query passes).

Arms: wire in (f32, bf16, int8) x mode in (flat, graph-fused,
graph-split). The poisoned relay h2d (~34 MB/s, NOTES_ROUND5 R5j) makes
the query upload the dominant per-pass wire term, so the wire dtype is
the main throughput lever (f32 16 MB/pass -> bf16 8 -> int8 4); the
mode axis doubles as the VERDICT r4 #6 fused/split decision data.
Passes are interleaved round-robin so relay drift hits every arm
equally. Recall@10 is scored once per (wire, graph) arm against the
exact host oracle on the first 4096 queries.

Run: python benchmarks/wire_ab.py            (real chip; ~10 min)
Env: AB_N (100000), AB_PASSES (3), AB_MODES (flat,fused,split),
     AB_WIRES (f32,bf16,int8)
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
    from bench import (blocked_ground_truth, make_bench_segment,
                       make_clustered, make_shim, quick_work_ms,
                       relay_calibration)
    from vectordb_tpu.config import global_config as gc
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("AB_N", 100_000))
    passes = int(os.environ.get("AB_PASSES", 3))
    modes = os.environ.get("AB_MODES", "flat,fused,split").split(",")
    wires = os.environ.get("AB_WIRES", "f32,bf16,int8").split(",")
    dim, k, batch, nq = 128, 10, 2048, 32768
    n_recall = 4096
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
    xn = (x ** 2).sum(1)
    gt = blocked_ground_truth(x, xn, queries[:n_recall], k)
    gt_sets = [set(row.tolist()) for row in gt]

    def set_arm(mode, wire):
        gc.flat_serve = "auto" if mode == "flat" else "off"
        gc.fused_traversal = "off" if mode == "split" else "auto"
        gc.query_dtype = wire

    def run_pass(nq_run):
        t0 = time.time()
        ids, _ = table.grouped_dense_search(
            "V", queries[:nq_run], valid, MetricType.EUCLIDEAN, k,
            batch=batch, mask_cacheable=True)
        return time.time() - t0, ids

    arms = [(m, w) for m in modes for w in wires]
    out = {"n": n, **calib, "tuned": tuned.get("V", {}),
           "arms": {f"{m}/{w}": {"qps": [], "work": []} for m, w in arms}}

    # Warm + recall score each arm once (compiles its program).
    for m, w in arms:
        set_arm(m, w)
        t0 = time.time()
        _, ids = run_pass(n_recall)
        hits = sum(len(set(ids[i].tolist()) & gt_sets[i])
                   for i in range(n_recall))
        rec = hits / (n_recall * k)
        out["arms"][f"{m}/{w}"]["recall"] = round(rec, 4)
        print(f"warm {m}/{w}: {time.time()-t0:.1f}s recall {rec:.4f}",
              file=sys.stderr, flush=True)
        run_pass(nq)  # warm the full-size program shape

    for p in range(passes):
        for m, w in arms:
            set_arm(m, w)
            work = quick_work_ms(1)
            dt, _ = run_pass(nq)
            a = out["arms"][f"{m}/{w}"]
            a["qps"].append(round(nq / dt, 1))
            a["work"].append(round(work, 1))
            print(f"pass {p} {m}/{w}: {dt*1e3:.0f} ms -> {nq/dt:.0f} qps "
                  f"(work {work:.1f})", file=sys.stderr, flush=True)

    for key, a in out["arms"].items():
        if a["qps"]:
            a["qps_med"] = round(float(np.median(a["qps"])), 1)
            a["qps_norm"] = round(float(np.median(
                [q * w / NOMINAL_WORK_MS
                 for q, w in zip(a["qps"], a["work"])])), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
