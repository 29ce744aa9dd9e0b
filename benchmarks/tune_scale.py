"""One-off large-scale tuning driver: build (or reuse) a cached graph at
SCALE_N rows, then sweep query-path knobs (rep-cover size, beam width,
termination width) against cached exact ground truth.

Used to recover recall@10 >= 0.99 at 10M x 96 (Deep10M shape) after the
first run came in at 0.985: the suspect is seed coverage (reps capped at
16384 = 1 per 610 rows at 10M).

Env: SCALE_N (default 10M), SCALE_DIM (96), CACHE_DIR (/tmp/vdb_cache).
Writes one JSON line per config to stderr-free stdout at the end.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (blocked_ground_truth, log, make_bench_segment,
                   make_clustered, make_shim)  # noqa: E402


def main():
    import vectordb_tpu  # noqa: F401
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex, _make_rep_ids
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("SCALE_N", 10_000_000))
    dim = int(os.environ.get("SCALE_DIM", 96))
    nq, k, batch = 2048, 10, 2048
    cache_dir = os.environ.get("CACHE_DIR", "/tmp/vdb_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"{n}_{dim}"

    t0 = time.time()
    x, queries = make_clustered(n, dim, nq)
    log(f"data gen: {time.time() - t0:.1f}s")
    seg, _ = make_bench_segment(n, dim, x)

    gpath = os.path.join(cache_dir, f"graph_{tag}.npz")
    if os.path.exists(gpath):
        graph = GraphIndex.load(gpath, seg, "V")
        log(f"graph cache hit: {gpath}")
        build_s = 0.0
    else:
        t0 = time.time()
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        build_s = time.time() - t0
        graph.save(gpath)
        log(f"graph built {build_s:.1f}s -> {gpath}")

    gt_path = os.path.join(cache_dir, f"gt_{tag}_{nq}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        t0 = time.time()
        gt = blocked_ground_truth(x, seg.dense_norms["V"][:n], queries, k,
                                  block=64)
        np.save(gt_path, gt)
        log(f"ground truth: {time.time() - t0:.1f}s")

    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    rng = np.random.default_rng(0)
    results = []

    def run_config(n_reps, ef, term):
        reps = rng.choice(n, size=n_reps, replace=False).astype(np.int32)
        if graph.nav_point not in reps:
            reps[0] = graph.nav_point
        graph.rep_ids_host = reps
        graph._rep_ids_dev = None
        global_config.search_ef = ef
        global_config.beam_term_width = term
        ids, _ = table.batch_dense_search("V", queries, valid,
                                          MetricType.EUCLIDEAN, k)  # warm
        hits = sum(len(set(ids[i, :k].tolist()) & set(gt[i].tolist()))
                   for i in range(nq))
        rec = hits / (nq * k)
        runs = []
        for _ in range(3):
            t0 = time.time()
            table.batch_dense_search("V", queries, valid,
                                     MetricType.EUCLIDEAN, k)
            runs.append(nq / (time.time() - t0))
        qps = float(np.median(runs))
        r = {"n_reps": n_reps, "ef": ef, "term": term,
             "qps": round(qps, 1), "recall": round(rec, 4)}
        log(f"reps={n_reps} ef={ef} term={term}: {qps:7.0f} qps "
            f"recall={rec:.4f}")
        results.append(r)

    default_reps = _make_rep_ids(n, graph.nav_point).shape[0]
    log(f"default rep count at n={n}: {default_reps}")
    for n_reps in (16384, 32768, 49152):
        run_config(n_reps, 64, 12)
    best = max(results, key=lambda r: r["recall"])
    for ef, term in ((96, 12), (96, 16), (128, 16)):
        run_config(best["n_reps"], ef, term)

    print(json.dumps({"build_seconds": build_s, "configs": results}))


if __name__ == "__main__":
    main()
