"""Multi-chip index sharding over a jax.sharding Mesh.

The reference's only multi-node story is leader/follower over shared storage
(/root/reference/engine/cmd/server/main.cpp:37, db/table_mvp.cpp:103-170 —
no NCCL/MPI). The TPU-native scale story instead shards the vector table and
per-shard ANN graphs row-wise across a device mesh:

  - every chip holds rows [s*Ns, (s+1)*Ns) of the table plus a graph built
    over its own rows;
  - a query batch is replicated; each chip runs the SAME flat-scan /
    beam-search kernel on its shard (shard_map);
  - per-shard top-k candidates are merged with jax.lax.all_gather over ICI
    and re-ranked globally — one collective per query batch.

Distance conventions and kernel bodies are shared with the single-chip path
(ops/flat.py, ops/beam.py); this module only adds the mesh plumbing.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..schema import MetricType

SHARD_AXIS = "shard"


def make_mesh(devices=None, axis: str = SHARD_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class ShardedTable:
    """Row-sharded device table: [n_shards * rows_per_shard, D]."""

    def __init__(self, mesh: Mesh, table_host: np.ndarray,
                 norms_host: Optional[np.ndarray] = None):
        self.mesh = mesh
        n_shards = mesh.devices.size
        n, d = table_host.shape
        if n % n_shards != 0:
            pad = n_shards - n % n_shards
            table_host = np.concatenate(
                [table_host, np.zeros((pad, d), table_host.dtype)], axis=0)
            n += pad
        self.rows_per_shard = n // n_shards
        self.n_rows = n
        if norms_host is None:
            norms_host = np.einsum("nd,nd->n", table_host,
                                   table_host).astype(np.float32)
        sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
        self.table = jax.device_put(table_host, sharding)
        self.norms = jax.device_put(norms_host,
                                    NamedSharding(mesh, P(SHARD_AXIS)))

    def put_adjacency(self, adjacency_host: np.ndarray):
        """Per-shard adjacency with LOCAL row ids, stacked row-wise."""
        return jax.device_put(
            adjacency_host, NamedSharding(self.mesh, P(SHARD_AXIS, None)))


def _local_scores(q, tab, t_norms, metric: int):
    ip = jax.lax.dot_general(q, tab,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if metric == int(MetricType.EUCLIDEAN):
        qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        return qn - 2.0 * ip + t_norms[None, :]
    if metric == int(MetricType.COSINE):
        return 1.0 - ip
    return -ip


def sharded_flat_topk(mesh: Mesh, queries, table, norms, mask, metric, k):
    """Replicated [B, D] queries vs row-sharded table -> global top-k.

    Per shard: fused distance + top-k over local rows; then one
    all_gather over ICI and a global re-rank. Returns ([B, k] dists,
    [B, k] global ids), fully replicated.
    """
    n_shards = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()), check_vma=False)
    def run(q, tab, nrm, msk):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        local_n = tab.shape[0]
        d = _local_scores(q, tab, nrm, int(metric))
        d = jnp.where(msk[None, :], d, jnp.inf)
        kk = min(k, local_n)
        neg_top, ids = jax.lax.top_k(-d, kk)
        gids = (ids + shard_idx * local_n).astype(jnp.int32)
        # Merge across shards: gather every shard's candidates, re-rank.
        all_d = jax.lax.all_gather(-neg_top, SHARD_AXIS)   # [S, B, kk]
        all_i = jax.lax.all_gather(gids, SHARD_AXIS)
        b = q.shape[0]
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, n_shards * kk)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, n_shards * kk)
        neg_m, sel = jax.lax.top_k(-all_d, min(k, n_shards * kk))
        return -neg_m, jnp.take_along_axis(all_i, sel, axis=1)

    return run(queries, table, norms, mask)


def sharded_beam_search(mesh: Mesh, queries, table, norms, adjacency,
                        rep_ids, metric, beam_width, expand=4, max_iters=32,
                        num_seeds=16):
    """Replicated queries vs row-sharded (table, per-shard graph).

    Each shard runs the single-chip beam-search kernel over its local rows
    and LOCAL adjacency (ids are shard-local); the per-shard beams are
    all_gathered and re-ranked globally. rep_ids are shard-local too.
    Returns ([B, beam_width] dists, [B, beam_width] global ids) replicated.
    """
    from ..ops.beam import beam_search_kernel

    n_shards = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P(SHARD_AXIS),
                  P(SHARD_AXIS, None), P(SHARD_AXIS)),
        out_specs=(P(), P()), check_vma=False)
    def run(q, tab, nrm, adj, reps):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        local_n = tab.shape[0]
        d, ids, _ = beam_search_kernel(
            q, tab, nrm, adj, reps, int(metric), int(beam_width),
            int(expand), int(max_iters), int(num_seeds))
        gids = jnp.where(ids >= 0, ids + shard_idx * local_n, -1)
        all_d = jax.lax.all_gather(d, SHARD_AXIS)          # [S, B, L]
        all_i = jax.lax.all_gather(gids, SHARD_AXIS)
        b = q.shape[0]
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
        neg_m, sel = jax.lax.top_k(-all_d, int(beam_width))
        return -neg_m, jnp.take_along_axis(all_i, sel, axis=1)

    return run(queries, table, norms, adjacency, rep_ids)


def sharded_knn_round(mesh: Mesh, table, norms, n_valid, metric, k):
    """One round of distributed exact-KNN graph construction.

    Every shard scores ITS rows against ALL rows by rotating shard blocks
    around the ring (jax.lax.ppermute over ICI), keeping a running top-k —
    the distributed form of ops/knn.exact_knn. Returns per-shard KNN ids
    (global row ids), sharded row-wise.
    """
    n_shards = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)),
        out_specs=P(SHARD_AXIS, None), check_vma=False)
    def run(tab, nrm):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        local_n = tab.shape[0]
        my_rows = jnp.arange(local_n, dtype=jnp.int32) + shard_idx * local_n

        # Running top-k over rotating blocks.
        best_d = jnp.full((local_n, k), jnp.inf, jnp.float32)
        best_i = jnp.full((local_n, k), -1, jnp.int32)
        blk, blk_nrm = tab, nrm
        blk_shard = shard_idx
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        for _ in range(n_shards):
            d = _local_scores(tab, blk, blk_nrm, int(metric))  # [ln, ln]
            blk_ids = (jnp.arange(local_n, dtype=jnp.int32)
                       + blk_shard * local_n)
            ids2d = jnp.broadcast_to(blk_ids[None, :], d.shape)
            self_mask = ids2d == my_rows[:, None]
            valid = (ids2d < n_valid) & ~self_mask
            d = jnp.where(valid, d, jnp.inf)
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, ids2d], axis=1)
            neg_top, sel = jax.lax.top_k(-cat_d, k)
            best_d = -neg_top
            best_i = jnp.take_along_axis(cat_i, sel, axis=1)
            blk = jax.lax.ppermute(blk, SHARD_AXIS, perm)
            blk_nrm = jax.lax.ppermute(blk_nrm, SHARD_AXIS, perm)
            blk_shard = (blk_shard - 1) % n_shards
        return best_i

    return run(table, norms)
