"""Micro-benchmark: fused neighborhood gather vs per-candidate row gather.

Premise under test (round-3 traversal lever): XLA random row-gathers are
row-COUNT bound on this chip (~70-180M rows/s regardless of row bytes,
benchmarks/gather_micro.py), so the beam kernel's per-iteration cost is
set by gathering [B*compact] candidate vector rows. If each node's
adjacency row instead stores its R neighbors' vectors INLINE (int8
quantized, CAGRA-Q style), one iteration gathers only [B*M] fused rows —
a ~24x descriptor-count cut — and the neighbor ids+vectors arrive
together. The existing exact re-rank (ops/beam._exact_rerank_device)
repairs int8 ordering error at the end.

This probes the end-to-end per-iteration cost of both layouts, including
the distance block, so the comparison prices in the int8 dequant.

Run on the real chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/fused_gather_micro.py
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


@jax.jit
def iter_split(table, adj, picked, q):
    """Current layout: gather adjacency rows, then candidate vector rows,
    then score. picked [B, M] int32; returns [B, M*R] distances."""
    b, m = picked.shape
    r = adj.shape[1]
    cand = jnp.take(adj, picked.reshape(-1), axis=0).reshape(b, m * r)
    safe = jnp.clip(cand, 0, table.shape[0] - 1)
    vecs = jnp.take(table, safe.reshape(-1), axis=0).reshape(
        b, m * r, table.shape[1])
    ip = jnp.einsum("bcd,bd->bc", vecs, q.astype(table.dtype),
                    preferred_element_type=jnp.float32)
    v_norms = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                         preferred_element_type=jnp.float32)
    return v_norms - 2.0 * ip


@jax.jit
def iter_fused(fused, picked, q_q):
    """Fused layout: fused [N, R*(D+pad)] int8 — each row is the node's R
    neighbor vectors (int8). One gather of [B*M] rows; dequant+score on
    device. q_q is the int8-scaled query (f32 values on the int8 grid)."""
    b, m = picked.shape
    n, rd = fused.shape
    d = q_q.shape[1]
    r = rd // d
    rows = jnp.take(fused, picked.reshape(-1), axis=0)      # [B*M, R*D] i8
    vecs = rows.reshape(b, m * r, d).astype(jnp.bfloat16)
    ip = jnp.einsum("bcd,bd->bc", vecs, q_q.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    v_norms = jnp.einsum("bcd,bcd->bc", vecs, vecs,
                         preferred_element_type=jnp.float32)
    return v_norms - 2.0 * ip


def bench(fn, *args, reps=7):
    out = fn(*args)
    float(out.astype(jnp.float32).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(o.astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n, d, r = 500_000, 128, 48
    b, m = 2048, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    adj_h = rng.integers(0, n, size=(n, r)).astype(np.int32)
    scale = np.abs(x).max() / 127.0
    x_q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    fused_h = x_q[adj_h.reshape(-1)].reshape(n, r * d)

    table = jnp.asarray(x, dtype=jnp.bfloat16)
    adj = jnp.asarray(adj_h)
    fused = jnp.asarray(fused_h)
    log(f"fused table: {fused_h.nbytes / 1e9:.2f} GB int8 "
        f"(vs {n * d * 2 / 1e9:.2f} GB bf16 table)")

    picked = jnp.asarray(rng.integers(0, n, size=(b, m)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    q_q = q / scale

    t_base = bench(lambda t, p: jnp.sum(p)[None].astype(jnp.float32),
                   table, picked)
    log(f"fetch baseline (relay rtt): {t_base * 1e3:.2f} ms")

    t_s = bench(iter_split, table, adj, picked, q)
    log(f"split (adj gather + {b * m * r} row gathers + score): "
        f"{(t_s - t_base) * 1e3:.2f} ms/iter")

    t_f = bench(iter_fused, fused, picked, q_q)
    log(f"fused ({b * m} x {r * d}B gathers + dequant + score): "
        f"{(t_f - t_base) * 1e3:.2f} ms/iter")
    log(f"speedup: {(t_s - t_base) / max(t_f - t_base, 1e-9):.2f}x")

    # Sanity: distances agree up to int8 quantization error.
    ds = np.asarray(iter_split(table, adj, picked, q))
    df = np.asarray(iter_fused(fused, picked, q_q)) * (scale * scale)
    rel = np.abs(ds - df) / np.maximum(np.abs(ds), 1e-3)
    log(f"median rel err vs split: {np.median(rel):.4f}, "
        f"p99 {np.percentile(rel, 99):.4f}")


if __name__ == "__main__":
    main()
