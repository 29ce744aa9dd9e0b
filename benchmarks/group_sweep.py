"""Engine-path QPS vs QueryGroupSize (dispatches per pass) at 100k/500k.

Runs the REAL engine grouped path (fresh query upload every pass, exact
on-device re-rank, tuned ef/iters) through the bench shim, sweeping the
number of super-chunks a pass is split into. Answers: is the bench's
G=2 (2 dispatches/pass, upload overlap) still the right default, or has
the per-dispatch fixed cost grown past the overlap win? One JSON line
per config.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 8192
BATCH = 2048
K = 10
DIM = 128
PASSES = 3


def main():
    import bench
    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    sizes = [int(s) for s in
             os.environ.get("GS_SIZES", "100000,500000").split(",")]
    groups = [int(g) for g in os.environ.get("GS_GROUPS", "1,2,4").split(",")]
    x, queries = bench.make_clustered(max(sizes), DIM, N_QUERIES)
    for n in sizes:
        seg, _ = bench.make_bench_segment(n, DIM, x[:n])
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        table = bench.make_shim(seg, graph)
        valid = seg.valid_mask()
        tuned = table.tune_search_ef(target_recall=0.995, k=K)
        print(json.dumps({"config": "tuned", "n": n,
                          "tuned": tuned.get("V", {})}), flush=True)
        for g in groups:
            global_config.query_group_size = g
            run = bench.make_runner(table, queries, valid,
                                    MetricType.EUCLIDEAN, K, BATCH,
                                    "grouped")
            run()  # warmup/compile for this G
            walls = []
            for _ in range(PASSES):
                t0 = time.perf_counter()
                run()
                walls.append(time.perf_counter() - t0)
            wall = float(np.median(walls))
            print(json.dumps({
                "config": f"engine_grouped_G{g}", "n": n,
                "pass_ms": round(wall * 1e3, 1),
                "qps": round(N_QUERIES / wall, 1),
                "walls_ms": [round(w * 1e3, 1) for w in walls]}),
                flush=True)


if __name__ == "__main__":
    main()
