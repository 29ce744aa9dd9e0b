"""IVF-partitioned exact-over-probes KNN: sub-quadratic candidate
generation for very large tables.

Replaces the role of the reference's NN-Descent (knn/nndescent.hpp:76-192)
above the exact-KNN scale limit, the TPU way: no per-node heaps or
spinlocks — a k-means partition computed with one-hot MXU matmuls, then
each cluster's rows are scored EXACTLY against the rows of its P nearest
clusters with dense matmul tiles. Cost is O(N * P * cluster_size * D)
instead of O(N^2 * D): at 10M rows it is minutes, not hours, on one chip.

All shapes are static: clusters are padded to a fixed capacity; rows that
overflow a full cluster spill to their next-nearest cluster (bounded
rounds, host-vectorized). Quality: probing the P nearest clusters captures
the true K-neighborhood with high recall on real (clustered) data, and the
graph build's occlusion pruning + representative seeding tolerate the
tail it misses.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..logger import logger
from ..schema import MetricType


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block", "n_iters"))
def _kmeans_iters(table, norms, centroids, n_valid, block: int,
                  n_iters: int):
    """Lloyd iterations with one-hot matmul updates (no scatter).

    table [N_pad, D] (bf16 ok), centroids [C, D] f32. Returns new
    centroids. Assignment by max inner product against normalized scoring:
    argmin ||x - c||^2 = argmax (x.c - ||c||^2/2).
    """
    n_pad, d = table.shape
    c = centroids.shape[0]
    n_blocks = n_pad // block

    def one_iter(centroids, _):
        cn = jnp.sum(centroids * centroids, axis=1)

        def body(carry, bi):
            sums, counts = carry
            x = jax.lax.dynamic_slice(
                table, (bi * block, 0), (block, d)).astype(jnp.float32)
            ip = jax.lax.dot_general(
                x, centroids, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            assign = jnp.argmax(ip - 0.5 * cn[None, :], axis=1)
            rows_ok = (bi * block + jnp.arange(block)) < n_valid
            onehot = (assign[:, None] ==
                      jnp.arange(c)[None, :]).astype(jnp.float32)
            onehot = jnp.where(rows_ok[:, None], onehot, 0.0)
            sums = sums + jax.lax.dot_general(
                onehot, x, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = counts + onehot.sum(axis=0)
            return (sums, counts), None

        init = (jnp.zeros((c, d), jnp.float32), jnp.zeros((c,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(
            body, init, jnp.arange(n_blocks, dtype=jnp.int32))
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new, None

    centroids, _ = jax.lax.scan(one_iter, centroids, None, length=n_iters)
    return centroids


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_all(table, centroids, n_valid, block: int):
    """Top-2 nearest centroids per row: [N_pad] primary, [N_pad] second."""
    n_pad, d = table.shape
    n_blocks = n_pad // block
    cn = jnp.sum(centroids * centroids, axis=1)

    def body(_, bi):
        x = jax.lax.dynamic_slice(
            table, (bi * block, 0), (block, d)).astype(jnp.float32)
        ip = jax.lax.dot_general(
            x, centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        score = ip - 0.5 * cn[None, :]
        _, top2 = jax.lax.top_k(score, 2)
        return None, (top2[:, 0], top2[:, 1])

    _, (a1, a2) = jax.lax.scan(body, None,
                               jnp.arange(n_blocks, dtype=jnp.int32))
    return a1.reshape(-1), a2.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "cap", "n_probe"))
def _probed_knn_batch(ci, members, member_valid, table, probe_ids,
                      metric: int, k: int, cap: int, n_probe: int):
    """Exact KNN for the rows of cluster `ci` against the rows of its
    probed clusters. members [C, cap] global row ids (-1 pad);
    probe_ids [C, P]. Returns ids/d [cap, k] for cluster ci's rows."""
    d_model = table.shape[1]
    my_rows = jax.lax.dynamic_slice(members, (ci, 0), (1, cap))[0]
    my_ok = jax.lax.dynamic_slice(member_valid, (ci, 0), (1, cap))[0]
    safe_mine = jnp.clip(my_rows, 0, table.shape[0] - 1)
    q = jnp.take(table, safe_mine, axis=0).astype(jnp.float32)
    qn = jnp.sum(q * q, axis=1)

    probes = jax.lax.dynamic_slice(probe_ids, (ci, 0),
                                   (1, n_probe))[0]          # [P]
    cand_rows = jnp.take(members, probes, axis=0).reshape(-1)   # [P*cap]
    cand_ok = jnp.take(member_valid, probes, axis=0).reshape(-1)
    safe_cand = jnp.clip(cand_rows, 0, table.shape[0] - 1)
    cvecs = jnp.take(table, safe_cand, axis=0)               # [P*cap, D]
    ip = jax.lax.dot_general(
        q.astype(table.dtype), cvecs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [cap, P*cap]
    if metric == int(MetricType.EUCLIDEAN):
        cn = jnp.sum(cvecs.astype(jnp.float32) ** 2, axis=1)
        dist = qn[:, None] - 2.0 * ip + cn[None, :]
    elif metric == int(MetricType.COSINE):
        dist = 1.0 - ip
    else:
        dist = -ip
    bad = (~cand_ok[None, :]) | (cand_rows[None, :] == my_rows[:, None])
    dist = jnp.where(bad, jnp.inf, dist)
    kk = min(k, dist.shape[1])
    neg_top, sel = jax.lax.top_k(-dist, kk)
    ids = jnp.take(cand_rows, sel.reshape(-1)).reshape(cap, kk)
    ids = jnp.where(jnp.isfinite(-neg_top), ids, -1)
    ids = jnp.where(my_ok[:, None], ids, -1)
    return -neg_top, ids


def ivf_knn(table, norms, n: int, k: int, metric: MetricType,
            cluster_rows: int = 4096, n_probe: int = 4,
            kmeans_iters: int = 6, block: int = 8192
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sub-quadratic KNN over rows [0, n) of device table [N_pad, D].

    Returns HOST numpy (ids [n, k] int32 global rows, d [n, k] f32),
    neighbors ascending, self excluded, -1 padded. Interface mirrors
    ops/knn.exact_knn but materializes on host (callers at this scale are
    the graph builder, which immediately needs host adjacency anyway).
    """
    import time as _time

    t0 = _time.perf_counter()
    n_pad = table.shape[0]
    c = max(8, _round_up(n, cluster_rows) // cluster_rows)
    blk = min(block, n_pad)
    while n_pad % blk:
        blk //= 2

    # 1. k-means on device (init: evenly strided rows).
    init_ids = np.linspace(0, n - 1, c).astype(np.int32)
    centroids = jnp.take(table, jnp.asarray(init_ids),
                         axis=0).astype(jnp.float32)
    centroids = _kmeans_iters(table, norms, centroids, n, blk, kmeans_iters)

    # 2. Assignment (top-2 clusters per row, for spill).
    a1, a2 = _assign_all(table, centroids, n, blk)
    a1 = np.asarray(a1)[:n]
    a2 = np.asarray(a2)[:n]
    t_km = _time.perf_counter()

    # 3. Padded membership with bounded spill (host, vectorized).
    cap = int(_round_up(int(np.bincount(a1, minlength=c).max() * 1.2) + 8,
                        128))
    # Hard bound on memory: refuse pathological caps.
    cap = min(cap, max(2 * cluster_rows, 8192))
    members = np.full((c, cap), -1, np.int64)
    fill = np.zeros(c, np.int64)
    pend_rows = np.arange(n, dtype=np.int64)
    pend_assign = a1.copy()
    for _ in range(2):  # primary placement, then one spill round (2nd
        order = np.argsort(pend_assign, kind="stable")  # nearest cluster)
        sc = pend_assign[order]
        uniq, first, cnt = np.unique(sc, return_index=True,
                                     return_counts=True)
        rank = np.arange(len(order)) - np.repeat(first, cnt)
        slot = fill[sc] + rank
        ok = slot < cap
        members[sc[ok], slot[ok]] = pend_rows[order][ok]
        fill += np.bincount(sc[ok], minlength=c).astype(np.int64)
        spill_rows = pend_rows[order][~ok]
        if len(spill_rows) == 0:
            break
        pend_rows = spill_rows
        pend_assign = a2[spill_rows]
    # Rows still unplaced after the spill round (pathological skew) go to
    # whatever clusters have space — every row must be represented.
    placed = np.zeros(n, dtype=bool)
    placed[members[members >= 0]] = True
    missing = np.nonzero(~placed)[0]
    if len(missing):
        logger.warning(f"ivf_knn: {len(missing)} rows overflowed their "
                       "top-2 clusters; packing into free slots")
        free_c, free_s = np.nonzero(members < 0)
        take = min(len(missing), len(free_c))
        members[free_c[:take], free_s[:take]] = missing[:take]

    members_dev = jnp.asarray(members.astype(np.int32))
    valid_dev = jnp.asarray(members >= 0)

    # 4. Cluster probe lists by centroid distance (self first).
    cn = jnp.sum(centroids * centroids, axis=1)
    ipc = centroids @ centroids.T
    cdist = cn[:, None] - 2.0 * ipc + cn[None, :]
    p = min(n_probe, c)
    _, probe_ids = jax.lax.top_k(-cdist, p)     # [C, P], self included
    t_part = _time.perf_counter()

    # 5. Exact KNN per cluster against probed clusters.
    out_ids = np.full((n, k), -1, np.int32)
    out_d = np.full((n, k), np.inf, np.float32)
    for ci in range(c):
        dd, ii = _probed_knn_batch(jnp.int32(ci), members_dev, valid_dev,
                                   table, probe_ids, int(metric), k,
                                   cap, p)
        ii_h = np.asarray(ii)
        dd_h = np.asarray(dd)
        mrows = members[ci]
        okm = mrows >= 0
        out_ids[mrows[okm]] = ii_h[okm]
        out_d[mrows[okm]] = dd_h[okm]
    logger.info(
        f"ivf_knn: n={n} C={c} cap={cap} probe={p} "
        f"kmeans {t_km - t0:.1f}s partition {t_part - t_km:.1f}s "
        f"score {_time.perf_counter() - t_part:.1f}s")
    return out_ids, out_d
