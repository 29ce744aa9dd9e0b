"""Bisect WHICH engine setup stage flips the relay into slow-put mode.

flat_pass_profile processes consistently measure ~25-40 MB/s puts while
bare-JAX micro processes in the same hour measure >1 GB/s — so some
engine-path step (segment/device_view/mask/pump/...) is the trigger.
Probes put bandwidth after each stage of the profiler's exact sequence.

Usage: python benchmarks/degrade_bisect_engine.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


_probe_arr = None


def put_ms():
    global _probe_arr
    import jax.numpy as jnp
    import ml_dtypes
    if _probe_arr is None:
        _probe_arr = np.random.default_rng(1).normal(
            size=(32768, 128)).astype(np.float32).astype(ml_dtypes.bfloat16)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jnp.asarray(_probe_arr).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def step(name):
    ms = put_ms()
    print(f"after {name:50s}: put 8MB {ms:7.1f} ms "
          f"({8.0 / ms * 1e3:6.0f} MB/s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from vectordb_tpu.config import global_config as cfg
    from vectordb_tpu.ops import flat as flat_ops
    from vectordb_tpu.schema import MetricType

    step("imports (bench + vectordb_tpu)")

    n, dim, nq, batch, k = 100_000, 128, 32_768, 2048, 10
    x, queries = B.make_clustered(n, dim, nq)
    step("make_clustered (pure numpy)")

    seg, _ = B.make_bench_segment(n, dim, x)
    table = B.make_shim(seg, None)
    table.graphs = {}
    valid = seg.valid_mask()
    step("segment + shim (no device work)")

    fs = table._flat_serve_view("V", n, batch, 1)
    store, tf32, use_pallas = fs
    step("device_view: store upload (bf16+f32+norms)")

    dm = table._composed_device_mask(store, valid, True, None)
    step("composed device mask")

    from vectordb_tpu.ops import pallas_topk
    fold = pallas_topk.pick_tile_c(store.dim_padded) // 128
    k_cand = min(k + flat_ops.FLAT_SERVE_SLACK, store.capacity // fold)

    qdev = jnp.asarray(queries[:batch * 2].astype(np.float32),
                       dtype=jnp.bfloat16)
    step("one 2-batch query put")

    out = flat_ops.flat_serve_grouped(
        qdev, store.buf, store.norms, dm, tf32, int(MetricType.EUCLIDEAN),
        int(k_cand), int(k), int(store.capacity),
        use_pallas=use_pallas, pack_out=True)
    out.block_until_ready()
    step("flat_serve_grouped warm (compile+run)")

    np.asarray(out)
    step("packed int32 drain (np.asarray of result)")

    cfg.query_group_size = 2
    table.grouped_dense_search("V", queries, valid, MetricType.EUCLIDEAN,
                               k, batch=batch, mask_cacheable=True)
    step("one full pump pass (threads + drains)")

    t0 = time.perf_counter()
    table.grouped_dense_search("V", queries, valid, MetricType.EUCLIDEAN,
                               k, batch=batch, mask_cacheable=True)
    full = (time.perf_counter() - t0) * 1e3
    print(f"full pass: {full:.1f} ms ({nq / full * 1e3:.0f} qps)",
          flush=True)
    step("second full pump pass")


if __name__ == "__main__":
    main()
