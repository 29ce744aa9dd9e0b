"""Measure kernel-only QPS: flat scan (XLA + Pallas) vs tuned graph
traversal at 100k/500k x 128 — the crossover study for the engine's
flat-vs-graph dispatch policy.

The reference uses brute force only below 512 rows
(vec_search_executor.hpp:28) because CPU brute force is O(N*D) scalar
work; on TPU the flat scan is an MXU matmul (~200 TFLOP/s) while graph
traversal is gather-bound (~70-180M rows/s), so the crossover sits
orders of magnitude higher. This script measures where.

Timing: device work is timed by fetching the [B, k] results to host
(what the engine's grouped mode pays), with queries pre-staged on
device (upload cost is the engine bench's concern). One JSON line per
config on stdout.
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


def make_clustered(n, dim, n_queries, seed=0, n_centers=3000):
    rng = np.random.default_rng(seed)
    centers = (rng.normal(size=(n_centers, dim)) * 2).astype(np.float32)
    x = np.empty((n, dim), dtype=np.float32)
    for s in range(0, n, 1_000_000):
        e = min(s + 1_000_000, n)
        x[s:e] = (centers[rng.integers(0, n_centers, e - s)]
                  + rng.normal(size=(e - s, dim)).astype(np.float32))
    queries = (x[rng.integers(0, n, n_queries)]
               + 0.1 * rng.normal(size=(n_queries, dim)).astype(np.float32))
    return x, queries


def timed_passes(run, label, n, extra=None):
    run()  # warmup/compile
    walls = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        run()
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    out = {"config": label, "n": n, "pass_ms": round(wall * 1e3, 1),
           "qps": round(N_QUERIES / wall, 1),
           "walls_ms": [round(w * 1e3, 1) for w in walls]}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import vectordb_tpu  # noqa: F401 (compile cache)
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.ops import beam as beam_ops
    from vectordb_tpu.ops import pallas_topk
    from vectordb_tpu.ops.flat import _flat_topk_scan
    from vectordb_tpu.schema import MetricType

    sizes = [int(s) for s in
             os.environ.get("FVG_SIZES", "100000,500000").split(",")]
    metric = int(MetricType.EUCLIDEAN)
    for n in sizes:
        x, queries = make_clustered(n, DIM, N_QUERIES)
        npad = -(-n // 8192) * 8192
        tab_h = np.zeros((npad, DIM), np.float32)
        tab_h[:n] = x
        nrm_h = np.zeros((npad,), np.float32)
        nrm_h[:n] = (x ** 2).sum(1)
        msk_h = np.zeros((npad,), bool)
        msk_h[:n] = True
        tab = jnp.asarray(tab_h, dtype=jnp.bfloat16)
        nrm = jnp.asarray(nrm_h)
        msk = jnp.asarray(msk_h)
        q_dev = jnp.asarray(queries)          # [8192, 128] f32, staged
        qn_dev = jnp.sum(q_dev ** 2, axis=1)

        # --- flat XLA scan path (per 2048-batch dispatches) -------------
        def run_flat_xla():
            outs = []
            for s in range(0, N_QUERIES, BATCH):
                d, i = _flat_topk_scan(q_dev[s:s + BATCH], tab, nrm, msk,
                                       metric, K, 8192)
                outs.append((d, i))
            for d, i in outs:
                np.asarray(d), np.asarray(i)

        timed_passes(run_flat_xla, "flat_xla_scan", n)

        # --- flat Pallas partial-min + topk (per batch) ------------------
        base = jnp.zeros((), jnp.int32)
        mask_f = jnp.asarray(msk_h.astype(np.float32))

        def run_flat_pallas():
            outs = []
            for s in range(0, N_QUERIES, BATCH):
                d, i = pallas_topk.fused_topk(
                    q_dev[s:s + BATCH].astype(jnp.bfloat16),
                    qn_dev[s:s + BATCH], base, tab, nrm,
                    metric, K + 32, n_valid=n, mask=mask_f)
                outs.append((d, i))
            for d, i in outs:
                np.asarray(d), np.asarray(i)

        if pallas_topk.supports(npad, DIM, BATCH):
            timed_passes(run_flat_pallas, "flat_pallas_partialmin", n)

        # --- grouped flat Pallas: all 4 batches inside one lax.scan -----
        import functools

        @functools.partial(jax.jit, static_argnames=("metric", "k", "nv"))
        def grouped_pallas(qg, qng, tab, nrm, mask_f, metric, k, nv):
            def step(c, qs):
                q, qn2 = qs
                d, i = pallas_topk.fused_topk(q, qn2, base, tab, nrm,
                                              metric, k, n_valid=nv,
                                              mask=mask_f)
                return c, (d, i)
            _, (ds, ids) = jax.lax.scan(
                step, jnp.int32(0), (qg, qng))
            return ds, ids

        qg = q_dev.reshape(-1, BATCH, DIM).astype(jnp.bfloat16)
        qng = qn_dev.reshape(-1, BATCH)

        def run_flat_pallas_grouped():
            d, i = grouped_pallas(qg, qng, tab, nrm, mask_f, metric,
                                  K + 32, n)
            np.asarray(d), np.asarray(i)

        if pallas_topk.supports(npad, DIM, BATCH):
            timed_passes(run_flat_pallas_grouped,
                         "flat_pallas_grouped", n)

        # --- tuned graph traversal (the current bench engine path) ------
        from vectordb_tpu.schema import (FieldSchema, FieldType, TableSchema)
        from vectordb_tpu.segment import TableSegment
        schema = TableSchema(id=0, name="fvg", fields=[
            FieldSchema(id=0, name="ID", is_primary_key=True,
                        field_type=FieldType.INT4),
            FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                        vector_dimension=DIM,
                        metric_type=MetricType.EUCLIDEAN)])
        seg = TableSegment(schema, n)
        seg.record_number = n
        seg.dense_host["V"][:n] = x
        seg.dense_norms["V"][:n] = (x ** 2).sum(1)
        t0 = time.time()
        graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        build_s = time.time() - t0
        from vectordb_tpu.config import global_config as cfg
        adj = graph.adjacency_traversal(cfg.beam_traversal_degree)
        dm = jnp.asarray(msk_h)
        tf32 = graph.table_f32(1 << 60)
        qg4 = q_dev.reshape(-1, BATCH, tab.shape[1]).astype(jnp.float32)
        ef, iters = 16, 4

        def run_graph():
            d, i = beam_ops.beam_search_grouped(
                qg4, graph.table, graph.norms, adj, graph.rep_ids, dm,
                tf32, metric, ef, cfg.beam_expand, iters, 32,
                min(cfg.beam_term_width, ef), min(K + 32, n), K,
                cfg.beam_compact)
            np.asarray(d), np.asarray(i)

        timed_passes(run_graph, "graph_grouped_ef16_it4", n,
                     {"build_s": round(build_s, 1)})

        # recall check for the flat pallas path (survivor-shadowing risk)
        gt_d, gt_i = _flat_topk_scan(q_dev[:BATCH], tab.astype(jnp.float32),
                                     nrm, msk, metric, K, 8192)
        gt = np.asarray(gt_i)
        d, i = pallas_topk.fused_topk(
            q_dev[:BATCH].astype(jnp.bfloat16), qn_dev[:BATCH], base, tab,
            nrm, metric, K + 32, n_valid=n, mask=mask_f)
        pi = np.asarray(i)[:, :]
        hits = sum(len(set(pi[r].tolist()) & set(gt[r].tolist()))
                   for r in range(BATCH))
        print(json.dumps({"config": "flat_pallas_recall_vs_exact", "n": n,
                          "recall_at_10_in_topk42": round(
                              hits / (BATCH * K), 4)}), flush=True)


if __name__ == "__main__":
    main()
