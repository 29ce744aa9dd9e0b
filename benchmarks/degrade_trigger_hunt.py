"""Find what flips the relay's h2d path into its ~35 MB/s degraded mode.

r4 concluded "any jitted kernel" degrades puts ~20x permanently; today a
plain matmul leaves puts at ~1.1 GB/s while the engine's flat-pass
profile (same hour) measured ~25 MB/s in-process. So the trigger is
something more specific. This runs the engine's actual startup sequence
one step at a time, measuring put bandwidth after each step.

Usage: python benchmarks/degrade_trigger_hunt.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def put_bw():
    import jax.numpy as jnp
    import ml_dtypes
    a = np.random.default_rng(1).normal(size=(32768, 128)).astype(
        np.float32).astype(ml_dtypes.bfloat16)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jnp.asarray(a).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    return ms, 8.0 / ms * 1e3


def step(name):
    ms, bw = put_bw()
    print(f"after {name:45s}: put 8MB {ms:7.1f} ms ({bw:6.0f} MB/s)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vectordb_tpu.ops import flat as flat_ops
    from vectordb_tpu.ops import pallas_topk
    from vectordb_tpu.schema import MetricType

    step("import (no kernel yet)")

    x = jnp.ones((256, 256), jnp.bfloat16)
    (x @ x).block_until_ready()
    step("small jit matmul")

    rng = np.random.default_rng(0)
    tab_np = rng.normal(size=(131072, 128)).astype(np.float32)
    tab = jnp.asarray(tab_np, dtype=jnp.bfloat16)
    tab.block_until_ready()
    step("131072x128 bf16 table put")

    tf32 = jnp.asarray(tab_np)
    norms = jnp.asarray((tab_np ** 2).sum(1))
    mask = jnp.ones((131072,), jnp.float32)
    jax.block_until_ready((tf32, norms, mask))
    step("f32 view + norms + mask puts")

    q = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32),
                    dtype=jnp.bfloat16)
    qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
    d = flat_ops.flat_distances(q, tab, norms, MetricType.EUCLIDEAN)
    d.block_until_ready()
    step("plain XLA distance matmul [2048,131072]")

    v = jax.lax.top_k(-d, 42)[0]
    v.block_until_ready()
    step("lax.top_k over [2048,131072]")

    vals, vids = pallas_topk.partial_min_scan(
        q, qn, jnp.int32(0), tab, norms, int(MetricType.EUCLIDEAN),
        n_valid=131072, mask=mask)
    jax.block_until_ready((vals, vids))
    step("PALLAS partial_min_scan")

    out = flat_ops.flat_serve_grouped(
        q, tab, norms, mask, tf32, int(MetricType.EUCLIDEAN),
        42, 10, 131072, use_pallas=True, pack_out=True)
    out.block_until_ready()
    step("flat_serve_grouped (pallas+topk+rerank)")

    # big HBM pressure: a second large buffer
    big = jnp.zeros((4096, 131072), jnp.float32)
    big.block_until_ready()
    step("2GB f32 HBM alloc")
    big.delete()
    step("after freeing the 2GB alloc")


if __name__ == "__main__":
    main()
