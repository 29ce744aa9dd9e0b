"""Steady-state throughput + engine-side slope: flat-serve vs graph.

Three questions, one chip window:
1. Engine slope: per-2048-batch device time with relay fixed costs
   cancelled (G=1 vs G=4 grouped passes), flat vs graph-fused — the
   figure a local PJRT deployment sees.
2. Pass-size scaling: QPS at 8192 vs 32768 queries per pass — how much
   of the bench pass is pipeline fill/drain vs steady-state.
3. Pipeline depth: upload_threads x dispatch_ahead at 32768 queries.

Run: python benchmarks/steady_state_ab.py  (real chip)
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
    dim, k, batch = 128, 10, 2048
    nq_big = 32768
    calib = relay_calibration()
    x, queries = make_clustered(n, dim, nq_big)
    seg, _ = make_bench_segment(n, dim, x)
    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    print(f"build: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    print(f"tuned: {tuned.get('V', {})}", file=sys.stderr, flush=True)

    def run_pass(nq):
        t0 = time.time()
        table.grouped_dense_search("V", queries[:nq], valid,
                                   MetricType.EUCLIDEAN, k, batch=batch,
                                   mask_cacheable=True)
        return time.time() - t0

    def set_flat(on):
        gc.flat_serve = "auto" if on else "off"

    out = {"n": n, **calib}

    # --- 1. engine slope: one dispatch, G=1 vs G=4 (3 reps each, median)
    def slope(flat):
        set_flat(flat)
        ts = {}
        for g in (1, 4):
            gc.query_group_size = g
            nq = batch * g
            run_pass(nq)  # warm/compile
            reps = []
            for _ in range(5):
                work = quick_work_ms(1)
                dt = run_pass(nq)
                reps.append(dt)
                print(f"slope flat={flat} g={g}: {dt*1e3:.1f} ms "
                      f"(work {work:.1f})", file=sys.stderr, flush=True)
            ts[g] = float(np.median(reps))
        return (ts[4] - ts[1]) / 3 * 1e3  # ms per 2048-batch

    out["engine_ms_per_batch_flat"] = round(slope(True), 2)
    out["engine_ms_per_batch_graph"] = round(slope(False), 2)

    # --- 2. pass-size scaling at G=2 (the bench config), flat + graph
    gc.query_group_size = 2
    for flat in (True, False):
        set_flat(flat)
        name = "flat" if flat else "graph"
        for nq in (8192, 32768):
            run_pass(nq)  # warm
            runs = []
            for _ in range(3):
                w = quick_work_ms(1)
                dt = run_pass(nq)
                runs.append((nq / dt, w))
                print(f"scale {name} nq={nq}: {dt*1e3:.0f} ms -> "
                      f"{nq/dt:.0f} qps (work {w:.1f})",
                      file=sys.stderr, flush=True)
            out[f"qps_{name}_{nq}"] = round(
                float(np.median([q for q, _ in runs])), 1)
            out[f"qps_norm_{name}_{nq}"] = round(float(np.median(
                [q * w / NOMINAL_WORK_MS for q, w in runs])), 1)

    # --- 3. pipeline depth sweep at nq=32768, graph-fused
    set_flat(False)
    for n_up, ahead in ((2, 2), (4, 2), (4, 4), (2, 4)):
        gc.upload_threads, gc.dispatch_ahead = n_up, ahead
        run_pass(nq_big)
        runs = []
        for _ in range(2):
            w = quick_work_ms(1)
            dt = run_pass(nq_big)
            runs.append((nq_big / dt, w))
            print(f"depth up={n_up} ahead={ahead}: {dt*1e3:.0f} ms -> "
                  f"{nq_big/dt:.0f} qps (work {w:.1f})",
                  file=sys.stderr, flush=True)
        out[f"qps_up{n_up}_ah{ahead}"] = round(
            float(np.median([q for q, _ in runs])), 1)
    gc.upload_threads, gc.dispatch_ahead = 2, 2

    print(json.dumps(out))


if __name__ == "__main__":
    main()
