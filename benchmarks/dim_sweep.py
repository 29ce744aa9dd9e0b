"""Micro-benchmark: how traversal cost scales with vector dimension.

The GIST-class run (500k x 960) is ~15x slower than 128-d at the same
row count. Candidates per iteration are identical, so the dim-dependent
terms are: candidate row-gather BYTES (2 KB bf16 rows at 960-d vs 256 B
at 128-d), the [B, C, D] distance einsum, and the [B, S] rep scan.
This isolates each at n=500k, B=2048.

Run on the real chip:
  PYTHONPATH=/root/repo python benchmarks/dim_sweep.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(fn, *args, reps=5):
    out = fn(*args)
    jnp.asarray(out).block_until_ready()
    float(jnp.sum(jnp.asarray(out).astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(jnp.sum(jnp.asarray(o).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def gather_rows(table, ids):
    return jnp.take(table, ids, axis=0)


@jax.jit
def gather_score(table, ids, q):
    """Gather + the per-iteration distance einsum (fused as in the beam
    kernel): ids [B, C] -> [B, C] scores."""
    b, c = ids.shape
    vecs = jnp.take(table, ids.reshape(-1), axis=0).reshape(b, c, -1)
    ip = jnp.einsum("bcd,bd->bc", vecs, q.astype(table.dtype),
                    preferred_element_type=jnp.float32)
    vn = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                    preferred_element_type=jnp.float32)
    return vn - 2.0 * ip


def main():
    from vectordb_tpu.ops.beam import beam_search_topk

    n, b, c, reps_n = 500_000, 2048, 96, 16384
    rng = np.random.default_rng(0)
    ids_h = rng.integers(0, n, (b, c)).astype(np.int32)

    # Relay-rtt baseline.
    t_base = bench(lambda i: jnp.sum(i)[None].astype(jnp.float32),
                   jnp.asarray(ids_h))
    log(f"fetch baseline (relay rtt): {t_base * 1e3:.2f} ms")

    for dim in (128, 256, 512, 1024):
        x = rng.normal(size=(n, dim)).astype(np.float32)
        table = jnp.asarray(x, dtype=jnp.bfloat16)
        tq8 = jnp.asarray(np.clip(np.round(x * 16), -127, 127),
                          dtype=jnp.int8)
        norms = jnp.asarray((x ** 2).sum(1))
        ids = jnp.asarray(ids_h)
        q = jnp.asarray(x[:b] + 0.05)

        t_g = bench(gather_rows, table, ids.reshape(-1)) - t_base
        t_g8 = bench(gather_rows, tq8, ids.reshape(-1)) - t_base
        t_s = bench(gather_score, table, ids, q) - t_base
        # Full traversal kernel, bench config.
        adj = jnp.asarray(
            rng.integers(0, n, size=(n, 48)).astype(np.int32))
        rep_ids = jnp.asarray(
            rng.choice(n, size=reps_n, replace=False).astype(np.int32))
        valid = jnp.ones((n,), dtype=bool)
        t_k = bench(
            functools.partial(beam_search_topk, metric=0, beam_width=64,
                              expand=4, max_iters=64, num_seeds=32,
                              term_width=12, k_out=18, compact=96),
            q, table, norms, adj, rep_ids, valid) - t_base
        bytes_g = b * c * dim * 2
        log(f"dim {dim:5d}: gather bf16 {t_g * 1e3:7.2f} ms "
            f"({bytes_g / t_g / 1e9:6.1f} GB/s, "
            f"{b * c / t_g / 1e6:6.1f} M rows/s) | int8 "
            f"{t_g8 * 1e3:7.2f} ms ({b * c / t_g8 / 1e6:6.1f} M rows/s) | "
            f"gather+score {t_s * 1e3:7.2f} ms | beam kernel "
            f"{t_k * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
