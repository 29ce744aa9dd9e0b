"""Benchmark: batched ANN query throughput at high recall on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio}

Workload (mirrors BASELINE.json config-3 at reduced scale): SIFT-like
clustered 200k x 128-d EUCLIDEAN table, graph index build, batched top-10
queries through the full engine path (beam search + validity filter + exact
f32 re-rank), recall@10 measured against the exact oracle and required to be
>= 0.95 for the number to count.

vs_baseline is measured against single-process numpy/BLAS brute-force QPS on
the same host — a stand-in for the reference's CPU SIMD flat scan (the
reference publishes no numbers; BASELINE.md documents this).
Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import vectordb_tpu  # noqa: F401  (configures the compile cache)
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import (FieldSchema, FieldType, MetricType,
                                     TableSchema)
    from vectordb_tpu.segment import TableSegment

    n, dim, k, n_queries, batch = 500_000, 128, 10, 2048, 2048
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(3000, dim)) * 2
    x = (centers[rng.integers(0, 3000, n)]
         + rng.normal(size=(n, dim))).astype(np.float32)
    queries = (x[rng.integers(0, n, n_queries)]
               + 0.1 * rng.normal(size=(n_queries, dim))).astype(np.float32)

    schema = TableSchema(id=0, name="bench", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim, metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x ** 2).sum(1)

    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    build_s = time.time() - t0
    log(f"graph build {n}x{dim}: {build_s:.1f}s")

    # Exact ground truth (blocked to bound memory).
    t0 = time.time()
    gt = np.empty((n_queries, k), dtype=np.int64)
    xn = (x ** 2).sum(1)
    for s in range(0, n_queries, 128):
        q = queries[s:s + 128]
        d = (q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T) + xn[None, :]
        gt[s:s + 128] = np.argpartition(d, k, axis=1)[:, :k]
        row_d = np.take_along_axis(d, gt[s:s + 128], axis=1)
        gt[s:s + 128] = np.take_along_axis(gt[s:s + 128],
                                           np.argsort(row_d, axis=1), axis=1)
    oracle_s = time.time() - t0
    log(f"numpy oracle: {oracle_s:.1f}s")

    # Numpy/BLAS brute-force QPS baseline (CPU flat scan, batched);
    # measured on a query subsample, it is throughput-per-query.
    n_base = 256
    t0 = time.time()
    for s in range(0, n_base, 128):
        q = queries[s:s + 128]
        d = (q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T) + xn[None, :]
        np.argpartition(d, k, axis=1)[:, :k]
    cpu_qps = n_base / (time.time() - t0)
    log(f"cpu brute baseline: {cpu_qps:.0f} qps")

    # Engine path: batched graph search + exact re-rank.
    from vectordb_tpu.config import global_config
    from vectordb_tpu.table import Table

    class _Shim(Table):
        def __init__(self):  # bench drives the segment directly
            self.segment = seg
            self.graphs = {"V": graph}
            self.config = global_config
            self.metric_map = {"V": MetricType.EUCLIDEAN}
            self.field_type_map = {"V": FieldType.VECTOR_FLOAT}

    table = _Shim()
    valid = seg.valid_mask()

    def run_all():
        hits = 0
        for s in range(0, n_queries, batch):
            ids, _ = table.batch_dense_search(
                "V", queries[s:s + batch], valid, MetricType.EUCLIDEAN, k)
            for i in range(ids.shape[0]):
                hits += len(set(ids[i, :k].tolist())
                            & set(gt[s + i].tolist()))
        return hits / (n_queries * k)

    recall = run_all()  # warmup + recall
    t0 = time.time()
    run_all()
    tpu_qps = n_queries / (time.time() - t0)
    log(f"engine: {tpu_qps:.0f} qps at recall@10={recall:.4f}")

    if recall < 0.95:
        log(f"RECALL BELOW FLOOR ({recall:.4f} < 0.95); reporting 0")
        tpu_qps = 0.0

    print(json.dumps({
        "metric": f"batched_qps_recall@10>=0.95_{n//1000}k_{dim}d",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 2) if cpu_qps else 0.0,
        "recall_at_10": round(recall, 4),
        "build_seconds": round(build_s, 1),
        "cpu_brute_qps": round(cpu_qps, 1),
    }))


if __name__ == "__main__":
    main()
