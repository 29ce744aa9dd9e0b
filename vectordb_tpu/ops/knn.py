"""Batched K-nearest-neighbor graph construction on TPU.

TPU-native replacement for the reference's NN-Descent candidate generation
(/root/reference/engine/db/index/knn/nndescent.hpp:76-192): instead of
spinlock-guarded per-node heaps updated by irregular local joins, the KNN
graph is built by *exact* blocked distance matmuls on the MXU — a
[block, D] x [D, chunk] score tile per step, reduced with the TPU's native
approximate top-k (PartialReduce) per chunk and an exact merge across chunks.
For the table sizes the reference supports (150k default capacity, 1M+ bench)
this is both faster on-TPU and higher quality (exact, not approximate,
neighborhoods) than porting NN-Descent's thread machinery.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import MetricType

# Rows scored per kernel invocation (queries) and per score tile (table).
DEFAULT_QUERY_BLOCK = 1024
DEFAULT_CHUNK = 16384


def _scores(q, tab, q_norms, t_norms, metric: int):
    """[B, D] x [C, D] -> [B, C] distances, f32 accumulation on the MXU."""
    ip = jax.lax.dot_general(
        q, tab, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if metric == int(MetricType.EUCLIDEAN):
        return q_norms[:, None] - 2.0 * ip + t_norms[None, :]
    if metric == int(MetricType.COSINE):
        return 1.0 - ip
    return -ip


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "chunk", "block"))
def _knn_block(q_base, table, t_norms, n_valid,
               metric: int, k: int, chunk: int, block: int):
    """Top-k over the whole table for one query block, excluding self.

    The query block is sliced out of the table at DYNAMIC offset q_base so
    one compiled executable serves every block (remote compilation is
    expensive in this deployment). table is [N_pad, D] with
    N_pad % chunk == 0; rows >= n_valid are masked.
    Per chunk: approx_max_k (fast PartialReduce on TPU) with generous
    oversampling, then one exact top_k merge across chunks.
    """
    n_pad = table.shape[0]
    n_chunks = n_pad // chunk
    b = block
    q = jax.lax.dynamic_slice(table, (q_base, 0), (block, table.shape[1]))
    q_norms = jax.lax.dynamic_slice(t_norms, (q_base,), (block,))
    table_c = table.reshape(n_chunks, chunk, table.shape[1])
    t_norms_c = t_norms.reshape(n_chunks, chunk)

    def body(carry, xs):
        tab, nrm, c_idx = xs
        base = c_idx * chunk
        d = _scores(q, tab, q_norms, nrm, metric)
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        self_ids = q_base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 0)
        invalid = (ids >= n_valid) | (ids == self_ids)
        d = jnp.where(invalid, jnp.inf, d)
        # Approximate per-chunk top-k: exactness is recovered by the final
        # exact merge as long as each chunk keeps its own true top-k, which
        # approx_max_k with recall_target=0.99 does to within noise; KNN-graph
        # quality is insensitive to this (the reference's NN-Descent is far
        # more approximate).
        neg_top, top_ids = jax.lax.approx_max_k(-d, k, recall_target=0.99)
        chunk_ids = jnp.take_along_axis(ids, top_ids, axis=1)
        return carry, (-neg_top, chunk_ids)

    _, (part_d, part_i) = jax.lax.scan(
        body, None, (table_c, t_norms_c, jnp.arange(n_chunks, dtype=jnp.int32)))
    # [n_chunks, B, k] -> [B, n_chunks * k] exact merge.
    all_d = jnp.transpose(part_d, (1, 0, 2)).reshape(b, n_chunks * k)
    all_i = jnp.transpose(part_i, (1, 0, 2)).reshape(b, n_chunks * k)
    neg_top, sel = jax.lax.top_k(-all_d, k)
    return -neg_top, jnp.take_along_axis(all_i, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("n_valid", "metric", "k",
                                             "block", "group"))
def _fused_knn_group(start0, table, norms, n_valid: int, metric: int, k: int,
                     block: int, group: int):
    """`group` consecutive query blocks through the fused Pallas
    partial-min scan + top-k in ONE dispatch (lax.scan over blocks).

    Per-dispatch overhead (relay enqueue + device launch gaps) dominates a
    ~500-launch KNN loop in tunneled deployments — measured 46 s for the
    500k KNN stage of which <5 s is device compute. Grouping cuts launches
    group-fold, the same fix that took the build pool stage 434 s -> 148 s.
    The per-block top-k runs inside the scan so only [group, block, k]
    survivors accumulate.
    """
    from . import pallas_topk

    def step(_, gi):
        q_base = start0 + gi * block
        d, ids = pallas_topk.fused_topk(
            jax.lax.dynamic_slice(
                table, (q_base, 0), (block, table.shape[1])),
            jax.lax.dynamic_slice(norms, (q_base,), (block,)),
            q_base, table, norms, metric, k,
            n_valid=n_valid, exclude_self=True)
        return None, (d, ids)

    _, (d, ids) = jax.lax.scan(step, None,
                               jnp.arange(group, dtype=jnp.int32))
    return (d.reshape(group * block, -1), ids.reshape(group * block, -1))


def exact_knn(table: jnp.ndarray, norms: jnp.ndarray, n: int, k: int,
              metric: MetricType, query_block: int = DEFAULT_QUERY_BLOCK,
              chunk: int = DEFAULT_CHUNK) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN graph over rows [0, n) of a device table [N_pad, D].

    Returns DEVICE arrays (ids [n_pad_qb, k] int32, dists f32) covering at
    least rows [0, n), neighbors sorted ascending by distance, self
    excluded. Results stay on device — host/device round trips are the
    dominant cost in this deployment, so callers fetch once at the end.

    All query blocks have identical shape (the table is padded), so the
    kernel compiles exactly once per table size (plus one grouped-scan
    executable when n spans >= KNN_GROUP blocks).
    """
    n_pad = table.shape[0]
    chunk = min(chunk, n_pad)
    if n_pad % chunk != 0:
        chunk = n_pad  # single chunk fallback for small pads
    k = min(k, max(n - 1, 1))
    query_block = min(query_block, n_pad)

    # Fast path: fused Pallas distance + partial-min kernel (TPU only) —
    # scores never materialize in HBM.
    from . import pallas_topk
    if (jax.devices()[0].platform != "cpu"
            and pallas_topk.supports(n_pad, table.shape[1],
                                     pallas_topk.TILE_Q)
            and query_block % pallas_topk.TILE_Q == 0):
        group = 16
        parts_d, parts_i = [], []
        start = 0
        # Grouped region: `group` query blocks per dispatch, bounded by
        # the blocks that contain real rows (n rounded up to a block) —
        # the device pad (next pow2 capacity) can exceed n by far more
        # than a block, and a full-table KNN scan per padding block is
        # pure waste. The per-block tail below covers [start, n).
        n_blocks_real = -(-n // query_block) * query_block
        while start + group * query_block <= min(n_pad, n_blocks_real):
            d, ids = _fused_knn_group(jnp.int32(start), table, norms, n,
                                      int(metric), k, query_block, group)
            parts_d.append(d)
            parts_i.append(ids)
            start += group * query_block
        for start in range(start, n_pad, query_block):
            if start >= n:
                break
            real_start = start
            if start + query_block > n_pad:
                real_start = n_pad - query_block
            d, ids = pallas_topk.fused_topk(
                jax.lax.dynamic_slice(
                    table, (real_start, 0), (query_block, table.shape[1])),
                jax.lax.dynamic_slice(norms, (real_start,), (query_block,)),
                jnp.int32(real_start), table, norms, int(metric), k,
                n_valid=n, exclude_self=True)
            if real_start != start:
                delta = start - real_start
                d, ids = d[delta:], ids[delta:]
            parts_d.append(d)
            parts_i.append(ids)
        return (jnp.concatenate(parts_i, axis=0),
                jnp.concatenate(parts_d, axis=0))

    parts_d = []
    parts_i = []
    # Iterate over the padded row space so every block has the same shape
    # and a dynamic offset; rows >= n produce garbage callers slice away.
    for start in range(0, n_pad, query_block):
        if start >= n:
            break
        real_start = start
        if start + query_block > n_pad:
            real_start = n_pad - query_block  # overlap tail: shape static
        d, ids = _knn_block(jnp.int32(real_start), table, norms, n,
                            int(metric), k, chunk, query_block)
        if real_start != start:
            delta = start - real_start
            d, ids = d[delta:], ids[delta:]
        parts_d.append(d)
        parts_i.append(ids)
    ids_all = jnp.concatenate(parts_i, axis=0)
    d_all = jnp.concatenate(parts_d, axis=0)
    return ids_all, d_all
