"""Engine-level multi-chip sharding: the dense-field data plane on a mesh.

The reference's only scale-out story is leader/follower over shared storage
(/root/reference/engine/db/table_mvp.cpp:103-170). The TPU-native story is a
row-sharded data plane: each chip holds an interleaved slice of a dense
vector column plus an ANN graph over its own rows; queries run the SAME
single-chip kernels per shard under `shard_map` and merge candidates with
one `all_gather` over ICI.

Layout: global row r lives on shard `r % S` at local slot `r // S`
(round-robin interleave), so concurrent inserts keep every shard balanced
and a prefix [0, n) of global rows is always an even spread. Device arrays
are [S, cap_s, D] with PartitionSpec("shard", None, None).

Components:
  - ShardedVectorStore: sharded mirror of one dense column with jitted
    append (insert-while-serving keeps working: appends touch only the
    written slots).
  - ShardedGraphIndex: per-shard fixed-degree graphs, built by the same
    KNN -> pool-search -> occlusion-prune pipeline as index/graph.py, run
    per shard inside shard_map (device phases) + per shard on host
    (reverse edges / connectivity repair).
  - sharded_graph_query / sharded_flat_query: replicated query batch in,
    globally re-ranked top-k out; one collective per batch.
"""
from __future__ import annotations

import functools
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..logger import logger
from ..schema import MetricType
from .sharded import SHARD_AXIS, make_mesh

_mesh_lock = threading.Lock()
_default_mesh: Optional[Mesh] = None


def get_engine_mesh(n_shards: int = 0) -> Optional[Mesh]:
    """Process-wide mesh for the sharded data plane. n_shards=0 -> all
    devices; returns None when the process has a single device and
    n_shards <= 1 (sharding would be pure overhead)."""
    global _default_mesh
    with _mesh_lock:
        if _default_mesh is not None:
            return _default_mesh
        devices = jax.devices()
        if n_shards <= 0:
            n_shards = len(devices)
        if n_shards <= 1:
            return None
        _default_mesh = make_mesh(devices[:n_shards])
        return _default_mesh


def _reset_for_tests() -> None:
    global _default_mesh
    with _mesh_lock:
        _default_mesh = None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interleave(host: np.ndarray, n_shards: int, cap_s: int,
                dtype=np.float32) -> np.ndarray:
    """[n, ...] host rows -> [S, cap_s, ...] with row r at [r % S, r // S]."""
    n = host.shape[0]
    out_shape = (cap_s * n_shards,) + host.shape[1:]
    buf = np.zeros(out_shape, dtype=dtype)
    buf[:n] = host
    return np.ascontiguousarray(
        buf.reshape((cap_s, n_shards) + host.shape[1:]).swapaxes(0, 1))


def shard_mask(valid: np.ndarray, n_shards: int, cap_s: int) -> np.ndarray:
    """Host validity mask [n] -> per-shard slot mask [S, cap_s]."""
    return _interleave(valid, n_shards, cap_s, dtype=bool)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _sharded_append(buf, norms, rows, new_norms, starts, *, mesh):
    """Append per-shard packed rows at per-shard start slots.

    Deliberately NOT donated: a concurrent search may hold (and be about
    to dispatch with) the previous buffer handle; donation would delete it
    out from under that call. The copy is on-device and batched-append
    rare, so correctness wins."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None)))
    def run(b, nr, r, nn, st):
        s0 = st[0]
        b = jax.lax.dynamic_update_slice(b, r.astype(b.dtype), (0, s0, 0))
        nr = jax.lax.dynamic_update_slice(nr, nn, (0, s0))
        return b, nr

    return run(buf, norms, rows, new_norms, starts)


class ShardedVectorStore:
    """Row-interleaved sharded mirror of one dense vector column."""

    def __init__(self, mesh: Mesh, dim: int, dtype: str = "bfloat16"):
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size)
        self.dim = dim
        self.dim_padded = _round_up(dim, 128)
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.cap_s = 0       # per-shard slot capacity
        self.length = 0      # global rows synced so far
        self.buf = None      # [S, cap_s, dim_padded]
        self.norms = None    # [S, cap_s] f32
        self._sync_lock = threading.Lock()

    @property
    def capacity(self) -> int:
        return self.cap_s * self.n_shards

    def _put(self, arr: np.ndarray, ndim_tail: int = None):
        """device_put sharded on the leading axis; spec rank == arr rank."""
        tail = arr.ndim - 1 if ndim_tail is None else ndim_tail
        spec = P(SHARD_AXIS, *([None] * tail))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _grow(self, needed: int, host: np.ndarray, norms_host: np.ndarray):
        s = self.n_shards
        min_cap = max(4096 // s, 256)
        cap_s = max(min_cap, self.cap_s or min_cap)
        # Keep s spare slots: append blocks are padded to the max per-shard
        # count (cnt_i + 1 worst case), and dynamic_update_slice CLAMPS
        # out-of-range offsets — without slack a clamped write would shift
        # down and overwrite live rows.
        while cap_s * s < needed + s:
            cap_s *= 2
        padded = np.zeros((needed, self.dim_padded), dtype=np.float32)
        padded[:, : self.dim] = host[:needed]
        self.buf = self._put(_interleave(padded, s, cap_s)).astype(self.dtype)
        self.norms = self._put(
            _interleave(norms_host[:needed].astype(np.float32), s, cap_s))
        self.cap_s = cap_s
        self.length = needed

    def sync(self, host: np.ndarray, norms_host: np.ndarray, n_rows: int):
        """Bring the sharded buffer up to date with host rows [0, n_rows).
        Serialized: concurrent syncs would both read self.length and
        double-append."""
        with self._sync_lock:
            self._sync_locked(host, norms_host, n_rows)

    def _sync_locked(self, host, norms_host, n_rows: int):
        if self.buf is None or n_rows + self.n_shards > self.capacity:
            self._grow(n_rows, host, norms_host)
            return
        if n_rows <= self.length:
            return
        s, lo, hi = self.n_shards, self.length, n_rows
        # Per-shard local slot ranges for global rows [lo, hi).
        starts = np.array([-(-(lo - i) // s) for i in range(s)], np.int32)
        stops = np.array([-(-(hi - i) // s) for i in range(s)], np.int32)
        m = int((stops - starts).max())
        rows = np.zeros((s, m, self.dim_padded), dtype=np.float32)
        nrm = np.zeros((s, m), dtype=np.float32)
        for i in range(s):
            cnt = int(stops[i] - starts[i])
            if cnt:
                g = np.arange(cnt) * s + (starts[i] * s + i)
                rows[i, :cnt, : self.dim] = host[g]
                nrm[i, :cnt] = norms_host[g]
        # Padding rows land at slots >= this shard's stop — beyond any row
        # that exists yet, and overwritten by the next sync. Masks are built
        # from n_rows so they never score.
        self.buf, self.norms = _sharded_append(
            self.buf, self.norms, self._put(rows).astype(self.dtype),
            self._put(nrm), self._put(starts), mesh=self.mesh)
        self.length = hi

    def invalidate(self):
        self.buf = None
        self.norms = None
        self.cap_s = 0
        self.length = 0


# ---------------------------------------------------------------------------
# Per-shard device build kernels (lax.scan'd so each compiles once).
# ---------------------------------------------------------------------------


def _local_scores(q, tab, q_norms, t_norms, metric: int):
    ip = jax.lax.dot_general(q, tab,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if metric == int(MetricType.EUCLIDEAN):
        return q_norms[:, None] - 2.0 * ip + t_norms[None, :]
    if metric == int(MetricType.COSINE):
        return 1.0 - ip
    return -ip


def _local_knn(tab, nrm, local_n, k: int, metric: int, qb: int, chunk: int):
    """Exact KNN over one shard's local rows: [C, D] -> ids/d [C, k]
    (local slot ids). Nested lax.scans keep the program small."""
    c_rows, d = tab.shape
    n_q = c_rows // qb
    n_c = c_rows // chunk

    def q_step(_, qi):
        q0 = qi * qb
        q = jax.lax.dynamic_slice(tab, (q0, 0), (qb, d))
        qn = jax.lax.dynamic_slice(nrm, (q0,), (qb,))
        row_ids = q0 + jnp.arange(qb, dtype=jnp.int32)

        def c_step(carry, ci):
            best_d, best_i = carry
            b0 = ci * chunk
            blk = jax.lax.dynamic_slice(tab, (b0, 0), (chunk, d))
            bn = jax.lax.dynamic_slice(nrm, (b0,), (chunk,))
            sc = _local_scores(q, blk, qn, bn, metric)
            ids = b0 + jax.lax.broadcasted_iota(jnp.int32, (qb, chunk), 1)
            invalid = (ids >= local_n) | (ids == row_ids[:, None])
            sc = jnp.where(invalid, jnp.inf, sc)
            cat_d = jnp.concatenate([best_d, sc], axis=1)
            cat_i = jnp.concatenate([best_i, ids], axis=1)
            neg, sel = jax.lax.top_k(-cat_d, k)
            return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

        init = (jnp.full((qb, k), jnp.inf, jnp.float32),
                jnp.full((qb, k), -1, jnp.int32))
        (bd, bi), _ = jax.lax.scan(c_step, init,
                                   jnp.arange(n_c, dtype=jnp.int32))
        return None, (bd, bi)

    _, (d_all, i_all) = jax.lax.scan(q_step, None,
                                     jnp.arange(n_q, dtype=jnp.int32))
    return d_all.reshape(c_rows, k), i_all.reshape(c_rows, k)


def _shard_build_fwd(tab, nrm, local_n, metric: int, knn_k: int,
                     degree: int, alpha: float, pool_size: int,
                     search_l: int, search_iters: int, batch: int,
                     reps, qb: int, chunk: int, knn_ids=None,
                     search_pools: bool = False):
    """Full device build for one shard: local KNN (exact in-kernel, or
    precomputed per-shard IVF ids passed in), then occlusion-prune per
    node batch — KNN-only by default (same measured policy as the
    single-chip build: with query-time rep seeding the pool-search stage
    earns nothing), pool-search + prune when search_pools. Returns
    forward edges [C, degree] (local slot ids, -1 padded)."""
    from ..index.graph import _pool_kernel, _prune_batch_kernel, _extract_fwd
    from ..ops.beam import beam_search_kernel
    from ..schema import MetricType as _MT

    c_rows, d = tab.shape
    if knn_ids is None:
        _, knn_ids = _local_knn(tab, nrm, local_n, knn_k, metric, qb, chunk)
    boot_deg = max(degree // 2, 16)
    boot_adj = jnp.where(knn_ids[:, :boot_deg] >= 0,
                         knn_ids[:, :boot_deg], -1).astype(jnp.int32)
    n_b = c_rows // batch

    def step(_, bi):
        start = bi * batch
        node_vecs = jax.lax.dynamic_slice(
            tab, (start, 0), (batch, d)).astype(jnp.float32)
        node_ids = start + jnp.arange(batch, dtype=jnp.int32)
        knn_b = jax.lax.dynamic_slice(
            knn_ids, (start, 0), (batch, knn_ids.shape[1]))
        if search_pools:
            _, s_ids, s_vis = beam_search_kernel(
                node_vecs, tab, nrm, boot_adj, reps, metric, search_l, 4,
                search_iters, term_width=16, compact=3 * boot_adj.shape[1])
            pool_ids, pool_d = _pool_kernel(node_ids, node_vecs, s_ids,
                                            s_vis, knn_b, tab, nrm, metric,
                                            pool_size)
            pool_valid = jnp.isfinite(pool_d)
            safe = jnp.clip(pool_ids, 0, c_rows - 1)
            pool_vecs = jnp.take(tab, safe.reshape(-1),
                                 axis=0).reshape(batch, pool_ids.shape[1],
                                                 -1)
        else:
            pool_ids = knn_b
            pool_valid = (knn_b >= 0) & (knn_b != node_ids[:, None])
            safe = jnp.clip(pool_ids, 0, c_rows - 1)
            pool_vecs = jnp.take(tab, safe.reshape(-1),
                                 axis=0).reshape(batch, pool_ids.shape[1],
                                                 -1)
            ip = jnp.einsum("bpd,bd->bp", pool_vecs,
                            node_vecs.astype(pool_vecs.dtype),
                            preferred_element_type=jnp.float32)
            if metric == int(_MT.EUCLIDEAN):
                q_norms = jax.lax.dynamic_slice(nrm, (start,), (batch,))
                v_norms = jnp.einsum("bpd,bpd->bp", pool_vecs, pool_vecs,
                                     preferred_element_type=jnp.float32)
                pool_d = q_norms[:, None] - 2.0 * ip + v_norms
            elif metric == int(_MT.COSINE):
                pool_d = 1.0 - ip
            else:
                pool_d = -ip
        kept = _prune_batch_kernel(pool_vecs, pool_d, pool_valid,
                                   metric, degree, alpha)
        fwd = jnp.where(node_ids[:, None] < local_n,
                        _extract_fwd(pool_ids, kept, degree), -1)
        return None, fwd

    _, fwd = jax.lax.scan(step, None, jnp.arange(n_b, dtype=jnp.int32))
    return fwd.reshape(c_rows, degree)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "metric", "knn_k", "degree", "pool_size",
                     "search_l", "search_iters", "batch", "qb", "chunk",
                     "alpha", "search_pools"))
def _sharded_build(buf, norms, local_ns, reps, *, alpha: float, mesh,
                   metric: int, knn_k: int, degree: int, pool_size: int,
                   search_l: int, search_iters: int, batch: int, qb: int,
                   chunk: int, search_pools: bool = False):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=P(SHARD_AXIS, None, None), check_vma=False)
    def run(tab, nrm, local_n, rp):
        fwd = _shard_build_fwd(tab[0], nrm[0], local_n[0], metric, knn_k,
                               degree, alpha, pool_size, search_l,
                               search_iters, batch, rp[0], qb, chunk,
                               search_pools=search_pools)
        return fwd[None]

    return run(buf, norms, local_ns, reps)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "metric", "knn_k", "degree", "pool_size",
                     "search_l", "search_iters", "batch", "qb", "chunk",
                     "alpha", "search_pools"))
def _sharded_build_preknn(buf, norms, local_ns, reps, knn_ids, *,
                          alpha: float, mesh, metric: int, knn_k: int,
                          degree: int, pool_size: int, search_l: int,
                          search_iters: int, batch: int, qb: int,
                          chunk: int, search_pools: bool = False):
    """Pool-search + prune per shard with PRECOMPUTED per-shard KNN ids
    (local slots, [S, cap_s, K]) — the sub-quadratic build path: KNN comes
    from per-shard IVF partitioning instead of the exact in-kernel scan."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS), P(SHARD_AXIS, None),
                  P(SHARD_AXIS, None, None)),
        out_specs=P(SHARD_AXIS, None, None), check_vma=False)
    def run(tab, nrm, local_n, rp, kn):
        fwd = _shard_build_fwd(tab[0], nrm[0], local_n[0], metric, knn_k,
                               degree, alpha, pool_size, search_l,
                               search_iters, batch, rp[0], qb, chunk,
                               knn_ids=kn[0], search_pools=search_pools)
        return fwd[None]

    return run(buf, norms, local_ns, reps, knn_ids)


# ---------------------------------------------------------------------------
# Sharded query kernels.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("mesh", "metric", "k"))
def sharded_flat_query(queries, buf, norms, mask, *, mesh, metric: int,
                       k: int):
    """Replicated [B, Dp] queries vs interleaved sharded table -> global
    top-k ([B, k] dists, [B, k] GLOBAL ids, -1/inf padded)."""
    n_shards = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS, None)),
        out_specs=(P(), P()), check_vma=False)
    def run(q, tab, nrm, msk):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        tab, nrm, msk = tab[0], nrm[0], msk[0]
        qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
        d = _local_scores(q.astype(tab.dtype), tab, qn, nrm, metric)
        d = jnp.where(msk[None, :], d, jnp.inf)
        kk = min(k, tab.shape[0])
        neg_top, ids = jax.lax.top_k(-d, kk)
        gids = ids * n_shards + shard_idx
        all_d = jax.lax.all_gather(-neg_top, SHARD_AXIS)
        all_i = jax.lax.all_gather(gids, SHARD_AXIS)
        b = q.shape[0]
        all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
        neg_m, sel = jax.lax.top_k(-all_d, min(k, all_d.shape[1]))
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        return -neg_m, jnp.where(jnp.isfinite(-neg_m), out_i, -1)

    return run(queries, buf, norms, mask)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "metric", "beam_width", "expand", "max_iters",
                     "num_seeds", "term_width", "k", "tail_start",
                     "has_tail", "compact", "pack_out", "packed_gb"))
def sharded_graph_query(queries_g, buf, norms, adjacency, reps, mask, *,
                        mesh, metric: int, beam_width: int, expand: int,
                        max_iters: int, num_seeds: int, term_width: int,
                        k: int, tail_start: int, has_tail: bool,
                        compact: int = 0, fused=None, scale=None,
                        pack_out: bool = False, packed_gb=None):
    """Per-shard beam search + optional flat tail over post-build slots,
    merged globally. `queries_g` is [G, B, Dp] replicated query GROUPS:
    all G batches run inside ONE shard_map program (Python-unrolled — the
    backend charges ~1.5 ms of floor per lax loop step, iter_micro.py),
    so multi-chip queries amortize the per-dispatch relay cost exactly
    like the single-chip grouped mode (VERDICT r3 #5; the reference
    analog is the executor pool keeping compute busy across requests,
    executor_pool.hpp:12-31). Returns ([G, B, k] dists, [G, B, k] GLOBAL
    ids), or ONE [G, B, 2k] int32 array when pack_out (dists bitcast in
    [..., :k] — int32 wire dtype because ids bitcast to f32 are denormals
    and get flushed to zero on the way out; see ops/beam).

    fused/scale: optional per-shard fused int8 traversal table
    ([S, cap_s, R*Dp] sharded) + dequant step — the single-chip fused
    gather layout (ops/beam.beam_search_kernel), here per shard. Compact
    is ignored on that path (there is no second gather to shrink)."""
    from ..ops.beam import beam_search_kernel

    if packed_gb is not None:
        # int8 query wire (ops/qwire): decode the packed buffer to
        # replicated [G, B, Dp] f32 INSIDE this program — one upload and
        # one dispatch per super-chunk, same as the single-chip paths.
        from ..ops import qwire
        g_pk, b_pk = packed_gb
        dp = buf.shape[-1]
        queries_g = qwire.decode_int8_queries(
            queries_g, g_pk * b_pk, dp).reshape(g_pk, b_pk, dp)

    n_shards = mesh.devices.size
    in_specs = [P(), P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                P(SHARD_AXIS, None)]
    args = [queries_g, buf, norms, adjacency, reps, mask]
    if fused is not None:
        in_specs.append(P(SHARD_AXIS, None, None))
        args.append(fused)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P() if pack_out else (P(), P()), check_vma=False)
    def run(qg, tab, nrm, adj, rp, msk, *rest):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        tab, nrm, adj, rp, msk = tab[0], nrm[0], adj[0], rp[0], msk[0]
        fz = rest[0][0] if rest else None
        c_rows = tab.shape[0]

        def one_batch(q):
            d, ids, _ = beam_search_kernel(
                q, tab, nrm, adj, rp, metric, beam_width, expand,
                max_iters, num_seeds, term_width,
                0 if fz is not None else compact, fz, scale)
            safe = jnp.clip(ids, 0, c_rows - 1)
            ok = (ids >= 0) & jnp.take(msk, safe)
            d = jnp.where(ok, d, jnp.inf)
            if has_tail:
                # Flat tail over slots [tail_start, C): rows inserted
                # after the graph build (reference tail merge,
                # vec_search_executor.cpp:885-914).
                qn = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)
                td = _local_scores(q.astype(tab.dtype), tab, qn, nrm,
                                   metric)
                slot = jax.lax.broadcasted_iota(jnp.int32, td.shape, 1)
                td = jnp.where((slot >= tail_start) & msk[None, :], td,
                               jnp.inf)
                kk = min(k, c_rows)
                neg_t, t_ids = jax.lax.top_k(-td, kk)
                d = jnp.concatenate([d, -neg_t], axis=1)
                ids = jnp.concatenate([ids, t_ids], axis=1)
            gids = jnp.where(jnp.isfinite(d), ids * n_shards + shard_idx,
                             -1)
            all_d = jax.lax.all_gather(d, SHARD_AXIS)
            all_i = jax.lax.all_gather(gids, SHARD_AXIS)
            b = q.shape[0]
            all_d = jnp.transpose(all_d, (1, 0, 2)).reshape(b, -1)
            all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
            neg_m, sel = jax.lax.top_k(-all_d, min(k, all_d.shape[1]))
            out_i = jnp.take_along_axis(all_i, sel, axis=1)
            return -neg_m, jnp.where(jnp.isfinite(-neg_m), out_i, -1)

        outs = [one_batch(qg[gi]) for gi in range(qg.shape[0])]
        ds = jnp.stack([o[0] for o in outs])
        ids = jnp.stack([o[1] for o in outs])
        if pack_out:
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(ds, jnp.int32), ids],
                axis=-1)
        return ds, ids

    return run(*args)


# ---------------------------------------------------------------------------
# ShardedGraphIndex: the engine-facing object (GraphIndex counterpart).
# ---------------------------------------------------------------------------

BUILD_QB = 256
BUILD_CHUNK = 2048
BUILD_BATCH = 512


class ShardedGraphIndex:
    """Per-shard fixed-degree graphs over the interleaved layout."""

    def __init__(self, mesh: Mesh, adjacency_host: np.ndarray,
                 rep_ids_host: np.ndarray, num_rows: int,
                 metric: MetricType):
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size)
        self.adjacency_host = adjacency_host  # [S, cap_s, R] local slots
        self.rep_ids_host = rep_ids_host      # [S, n_reps] local slots
        self.num_rows = int(num_rows)         # global rows covered
        self.metric = metric
        sharding3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        sharding2 = NamedSharding(mesh, P(SHARD_AXIS, None))
        self.adjacency = jax.device_put(adjacency_host, sharding3)
        self.rep_ids = jax.device_put(rep_ids_host, sharding2)

    @classmethod
    def build(cls, store: ShardedVectorStore, host: np.ndarray,
              norms_host: np.ndarray, n: int, metric: MetricType,
              knn_k: int = 64, degree: int = 32, alpha: float = 1.2
              ) -> "ShardedGraphIndex":
        """Distributed build: device phases run per shard in one shard_map
        program; reverse edges + connectivity repair run per shard on host
        over the fetched forward edges."""
        import time as _time
        from ..index.graph import _make_rep_ids, finalize_adjacency

        t0 = _time.perf_counter()
        mesh, s = store.mesh, store.n_shards
        store.sync(host, norms_host, n)
        cap_s = store.cap_s
        local_ns = np.array([-(-(n - i) // s) for i in range(s)], np.int32)
        knn_k = int(min(knn_k, int(local_ns.min()) - 1))
        degree = min(degree, knn_k)
        r_total = degree * 2

        # Per-shard representative seeds (local slots): k-means COVER when
        # the shard is big enough — random reps miss small isolated
        # clusters and strand their queries (measured; see
        # index/graph._cover_rep_ids). The interleaved layout puts ~1/S of
        # every cluster on each shard, so per-shard covers see every basin.
        n_reps = int(min(2048, max(128, cap_s // 16)))
        reps = np.zeros((s, n_reps), np.int32)
        rng = np.random.default_rng(0)
        devices = mesh.devices.reshape(-1)
        for i in range(s):
            ln = max(int(local_ns[i]), 1)
            cover = None
            if ln >= 4 * n_reps and n_reps >= 256:
                try:
                    from ..index.graph import _cover_rep_ids
                    g = np.arange(ln) * s + i
                    pad_n = max(_round_up(ln, 8192), 8192)
                    rows = np.zeros((pad_n, store.dim_padded), np.float32)
                    rows[:ln, : store.dim] = host[g, : store.dim]
                    tab_i = jax.device_put(rows, devices[i]).astype(
                        store.dtype)
                    cover = _cover_rep_ids(tab_i, ln, n_reps)
                    del tab_i
                except Exception as e:
                    logger.warning(f"shard {i} cover reps failed ({e}); "
                                   "random fallback")
            if cover is None:
                reps[i] = rng.choice(ln, size=n_reps,
                                     replace=(ln < n_reps)).astype(np.int32)
            elif cover.size < n_reps:
                reps[i, :cover.size] = cover
                reps[i, cover.size:] = rng.choice(
                    ln, size=n_reps - cover.size).astype(np.int32)
            else:
                reps[i] = cover[:n_reps]

        qb = min(BUILD_QB, cap_s)
        while cap_s % qb:
            qb //= 2
        chunk = min(BUILD_CHUNK, cap_s)
        while cap_s % chunk:
            chunk //= 2
        batch = min(BUILD_BATCH, cap_s)
        while cap_s % batch:
            batch //= 2
        pool_size = min(128, max(degree * 2, 64))
        from ..index.graph import resolve_build_search_params
        b_sl, b_it = resolve_build_search_params()
        from ..config import global_config as _gc
        pools = getattr(_gc, "build_search_pools", "auto") == "on"

        put2 = NamedSharding(mesh, P(SHARD_AXIS, None))
        put1 = NamedSharding(mesh, P(SHARD_AXIS))
        from ..config import global_config as _cfg

        if int(local_ns.max()) >= getattr(_cfg, "ivf_knn_threshold",
                                          3_000_000):
            # Sub-quadratic path: per-shard IVF-partitioned KNN (host-
            # orchestrated, one shard's device at a time — the probe stage
            # is grouped dispatches, so serialization is bounded), then the
            # pool/prune phases run for all shards in one shard_map program.
            knn_pre = cls._per_shard_ivf_knn(mesh, host, n, local_ns, cap_s,
                                             knn_k, metric, store)
            fwd_dev = _sharded_build_preknn(
                store.buf, store.norms, jax.device_put(local_ns, put1),
                jax.device_put(reps, put2),
                jax.device_put(knn_pre,
                               NamedSharding(mesh, P(SHARD_AXIS, None,
                                                     None))),
                alpha=float(alpha), mesh=mesh, metric=int(metric),
                knn_k=knn_k, degree=degree, pool_size=pool_size,
                search_l=b_sl, search_iters=b_it, batch=batch, qb=qb,
                chunk=chunk, search_pools=pools)
        else:
            fwd_dev = _sharded_build(
                store.buf, store.norms, jax.device_put(local_ns, put1),
                jax.device_put(reps, put2), alpha=float(alpha), mesh=mesh,
                metric=int(metric), knn_k=knn_k, degree=degree,
                pool_size=pool_size, search_l=b_sl, search_iters=b_it,
                batch=batch, qb=qb, chunk=chunk, search_pools=pools)
        fwd = np.asarray(fwd_dev)  # [S, cap_s, degree], one fetch

        # Host finalize per shard over local-id space.
        adjacency = np.full((s, cap_s, r_total), -1, np.int32)
        for i in range(s):
            ln = int(local_ns[i])
            g = np.arange(ln) * s + i  # local slot -> global row
            adj_i, n_comp = finalize_adjacency(
                fwd[i, :ln], host[g], norms_host[g], ln, degree, r_total,
                np.unique(reps[i][reps[i] < ln]))
            adjacency[i, :ln] = adj_i
            if n_comp:
                logger.info(f"shard {i}: bridged {n_comp} components")
        build_s = _time.perf_counter() - t0
        logger.info(f"Sharded graph build: {n} rows over {s} shards, "
                    f"degree {degree}x2, {build_s:.1f}s")
        return cls(mesh, adjacency, reps, n, metric)

    @staticmethod
    def _per_shard_ivf_knn(mesh: Mesh, host: np.ndarray, n: int,
                           local_ns: np.ndarray, cap_s: int, knn_k: int,
                           metric: MetricType, store) -> np.ndarray:
        """IVF-partitioned KNN per shard (ops/ivf.py) over each shard's own
        rows; returns [S, cap_s, K] LOCAL slot ids (-1 padded)."""
        from ..config import global_config
        from ..ops.ivf import ivf_knn

        s = int(mesh.devices.size)
        devices = mesh.devices.reshape(-1)
        out = np.full((s, cap_s, knn_k), -1, np.int32)
        for i in range(s):
            ln = int(local_ns[i])
            g = np.arange(ln) * s + i  # local slot -> global row
            pad_n = max(_round_up(ln, 8192), 8192)
            rows = np.zeros((pad_n, store.dim_padded), np.float32)
            rows[:ln, : store.dim] = host[g, : store.dim]
            tab_i = jax.device_put(rows, devices[i]).astype(store.dtype)
            ids_h, _ = ivf_knn(tab_i, None, ln, knn_k, metric,
                               n_probe=getattr(global_config,
                                               "ivf_probes", 0),
                               need_dists=False)
            out[i, :ln] = ids_h
            del tab_i
        return out

    def fused_traversal(self, store: "ShardedVectorStore", host: np.ndarray,
                        max_bytes: int):
        """Per-shard fused int8 traversal table: `([S, cap_s, R*Dp] int8
        sharded device array, dequant scale)` — the single-chip
        GraphIndex.fused_traversal layout (node row inlines its traversal
        neighbors' int8 vectors; see index/graph.py for the measured
        rationale), built per shard over LOCAL slot ids. Unlike the
        single-chip path it fuses the FULL adjacency width R: the sharded
        kernel traverses its whole adjacency, and the fused row width must
        match the adjacency gather's R.

        Gated by TOTAL bytes <= max_bytes (the same FusedMaxBytes knob as
        single-chip — a multi-chip deployment with S chips of HBM should
        raise it proportionally) — returns (None, None) when gated off.
        Cached on the index (graph rows are frozen at build; the store is
        append-only past num_rows, which the fused table never covers)."""
        cached = getattr(self, "_fused_cache", None)
        if cached is not None:
            # A cached DENY only holds for budgets <= the one it was
            # evaluated at — a later call with a raised FusedMaxBytes
            # (e.g. a forced A/B) must re-evaluate, not inherit the deny.
            if cached[0] is not None or int(max_bytes) <= getattr(
                    self, "_fused_deny_budget", 0):
                return cached
        s, cap_s, r_total = self.adjacency_host.shape
        dp, dim = store.dim_padded, store.dim
        deny = (None, None)
        need = s * cap_s * r_total * dp
        if need > max_bytes:
            self._fused_cache = deny
            self._fused_deny_budget = int(max_bytes)
            return deny
        # Per-device gate: live stats when the backend reports them, else
        # DeviceHbmBytes (config) minus the per-device resident shards
        # (store buf + norms + adjacency) — the axon backend returns no
        # memory_stats, so the configured-total path is what actually
        # guards real deployments (same policy as GraphIndex._free_hbm_bytes).
        from ..utils import device_hbm_stats
        stats = device_hbm_stats()
        need_dev = need // s
        if stats is not None:
            if need_dev > 0.55 * (stats[1] - stats[0]):
                self._fused_cache = deny
                self._fused_deny_budget = int(max_bytes)
                return deny
        else:
            from ..config import global_config
            hbm = int(getattr(global_config, "device_hbm_bytes", 0))
            if hbm > 0:
                resident_dev = (store.buf.nbytes + store.norms.nbytes
                                + self.adjacency_host.nbytes
                                + self.rep_ids_host.nbytes) // s
                if need_dev > 0.65 * (hbm - resident_dev):
                    self._fused_cache = deny
                    self._fused_deny_budget = int(max_bytes)
                    return deny
        n = self.num_rows
        scale = float(np.abs(host[:n]).max()) / 127.0
        if not np.isfinite(scale) or scale <= 0.0:
            scale = 1.0
        fused_h = np.zeros((s, cap_s, r_total * dp), np.int8)
        for i in range(s):
            ln = -(-(n - i) // s)
            if ln <= 0:
                continue
            g = np.arange(ln) * s + i  # local slot -> global row
            x_q = np.clip(np.round(host[g, :dim] / scale),
                          -127, 127).astype(np.int8)
            adj = np.clip(self.adjacency_host[i, :ln], 0, ln - 1)
            blk = np.zeros((ln, r_total, dp), np.int8)
            blk[:, :, :dim] = x_q[adj]
            fused_h[i, :ln] = blk.reshape(ln, r_total * dp)
        fused = jax.device_put(
            fused_h, NamedSharding(self.mesh, P(SHARD_AXIS, None, None)))
        self._fused_cache = (fused, np.float32(scale))
        return self._fused_cache

    def save(self, path: str) -> None:
        import io
        import json as _json
        from ..utils import atomic_write_bytes

        buf = io.BytesIO()
        np.savez(buf, adjacency=self.adjacency_host,
                 rep_ids=self.rep_ids_host,
                 meta=np.frombuffer(_json.dumps({
                     "num_rows": self.num_rows,
                     "metric": int(self.metric),
                     "n_shards": self.n_shards,
                 }).encode("utf-8"), dtype=np.uint8))
        atomic_write_bytes(path, buf.getvalue())

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedGraphIndex":
        import json as _json

        with np.load(path, allow_pickle=False) as z:
            meta = _json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
            adjacency = z["adjacency"]
            rep_ids = z["rep_ids"]
        if meta["n_shards"] != int(mesh.devices.size):
            raise ValueError(
                f"graph sharded over {meta['n_shards']} shards, mesh has "
                f"{mesh.devices.size}")
        return cls(mesh, adjacency, rep_ids, meta["num_rows"],
                   MetricType(meta["metric"]))


class ShardedDenseField:
    """Per-field sharded data plane attached to a Table: store + graph +
    query dispatch. Search returns GLOBAL candidate ids; the caller applies
    the same exact re-rank as the single-chip path."""

    def __init__(self, mesh: Mesh, dim: int, dtype: str = "bfloat16"):
        self.mesh = mesh
        self.store = ShardedVectorStore(mesh, dim, dtype)
        self.graph: Optional[ShardedGraphIndex] = None
        self._mask_cache: Optional[Tuple[int, object]] = None
        # name -> (mutation_version, cap_s, sharded column or None).
        self._col_cache: Dict[str, Tuple[int, int, object]] = {}

    def sync(self, host: np.ndarray, norms_host: np.ndarray, n_rows: int):
        self.store.sync(host, norms_host, n_rows)

    def _device_column(self, segment, name: str):
        """One primitive/geo column interleaved to this field's [S, cap_s]
        layout, device_put sharded on the mesh and cached by segment
        mutation version (same exactness rule as the single-chip
        segment.device_column: ints >= 2^24 fall back to host). Geo columns
        are a (lat, lon) pair."""
        st = self.store
        key_ver, key_cap = segment.mutation_version, st.cap_s
        hit = self._col_cache.get(name)
        if hit is not None and hit[0] == key_ver and hit[1] == key_cap:
            return hit[2]
        n = segment.record_number
        s = st.n_shards
        put = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        if name in segment.geo_cols:
            lat, lon = segment.geo_cols[name]
            dev = (jax.device_put(_interleave(
                       lat[:n].astype(np.float32), s, key_cap), put),
                   jax.device_put(_interleave(
                       lon[:n].astype(np.float32), s, key_cap), put))
        else:
            col = segment.primitive_cols[name]
            if col.dtype.kind in "iu" and n and \
                    np.abs(col[:n]).max(initial=0) >= (1 << 24):
                dev = None  # f32 can't represent exactly; host path
            else:
                dev = jax.device_put(_interleave(
                    col[:n].astype(np.float32), s, key_cap), put)
        if len(self._col_cache) > 64:
            self._col_cache.clear()
        self._col_cache[name] = (key_ver, key_cap, dev)
        return dev

    def device_columns(self, segment, dfilter):
        """Sharded device columns for a compiled DeviceFilter's field
        order, or None when any column can't live on device exactly (the
        caller folds the filter into the host mask). Requires the store to
        be synced (cap_s set) — call sync() first."""
        if self.store.cap_s == 0:
            return None
        cols = []
        for fname in dfilter.field_order:
            c = self._device_column(segment, fname)
            if c is None:
                return None
            cols.append(c)
        return cols

    def _sharded_mask(self, valid: np.ndarray, version: Optional[int]):
        """Per-shard slot mask on device; cached by segment mutation
        version for pure-validity masks (uploads are expensive here)."""
        if (version is not None and self._mask_cache is not None
                and self._mask_cache[0] == version
                and self._mask_cache[1].shape[1] == self.store.cap_s):
            return self._mask_cache[1]
        mask = shard_mask(valid, self.store.n_shards, self.store.cap_s)
        dm = jax.device_put(
            mask, NamedSharding(self.mesh, P(SHARD_AXIS, None)))
        if version is not None:
            self._mask_cache = (version, dm)
        return dm

    def composed_mask(self, valid: np.ndarray, mask_version: Optional[int],
                      shard_filter=None):
        """[S, cap_s] device mask = validity (version-cached) & optional
        device-evaluated filter. The filter runs elementwise per shard over
        version-cached sharded columns — no host evaluation, no upload."""
        mask_dev = self._sharded_mask(valid, mask_version)
        if shard_filter is not None:
            dfilter, cols = shard_filter
            mask_dev = dfilter.mask_from_cols(mask_dev, cols,
                                              replicated_consts=True)
        return mask_dev

    def launch(self, queries_padded: np.ndarray, valid: np.ndarray,
               metric: MetricType, k: int, use_graph: bool,
               beam_width: int, expand: int, term_width: int,
               mask_version: Optional[int] = None, compact: int = 0,
               shard_filter=None, fused=None, iters: int = 0):
        """[B, Dp] padded queries -> DEVICE (d, ids) handles, globally
        re-ranked top-k (async; fetch with jax.device_get).

        iters: per-call traversal depth cap (0 = full beam-width depth) —
        the tuned (ef, iters) ladder applies on the sharded plane exactly
        as on a single chip (VERDICT r3 #5).

        shard_filter: optional (DeviceFilter, sharded_cols) pair from
        device_columns() — the filter evaluates elementwise per shard ON
        DEVICE over version-cached sharded columns, so a filtered query
        performs zero per-query host mask evaluation or upload (the
        single-chip expr/device.py guarantee, now on the mesh)."""
        st = self.store
        mask_dev = self.composed_mask(valid, mask_version, shard_filter)
        q = jnp.asarray(queries_padded)
        g = self.graph
        if use_graph and g is not None:
            tail = st.length > g.num_rows
            d, ids = sharded_graph_query(
                q[None], st.buf, st.norms, g.adjacency, g.rep_ids,
                mask_dev, mesh=self.mesh, metric=int(metric),
                beam_width=int(beam_width), expand=int(expand),
                max_iters=int(iters or beam_width), num_seeds=32,
                term_width=int(term_width), k=int(k),
                tail_start=int(g.num_rows // st.n_shards),
                has_tail=bool(tail), compact=int(compact),
                fused=None if fused is None else fused[0],
                scale=None if fused is None else fused[1])
            return d[0], ids[0]
        return sharded_flat_query(
            q, st.buf, st.norms, mask_dev, mesh=self.mesh,
            metric=int(metric), k=int(k))

    def launch_grouped(self, queries_g: np.ndarray, valid: np.ndarray,
                       metric: MetricType, k: int, beam_width: int,
                       expand: int, term_width: int,
                       mask_version: Optional[int] = None,
                       compact: int = 0, fused=None, iters: int = 0,
                       packed_gb=None):
        """[G, B, Dp] padded query groups -> ONE packed [G, B, 2k] int32
        device handle (dists bitcast in [..., :k], GLOBAL ids in
        [..., k:]): G batches per dispatch + a single-array fetch — the
        single-chip grouped throughput mode on the mesh. Graph must
        exist; the flat tail is merged in-kernel.

        packed_gb: static (G, B) when queries_g is an int8 wire buffer
        (ops/qwire layout) instead of [G, B, Dp] f32 — decoded inside
        the device program, replicated like the f32 queries."""
        st = self.store
        g = self.graph
        mask_dev = self.composed_mask(valid, mask_version)
        tail = st.length > g.num_rows
        return sharded_graph_query(
            jnp.asarray(queries_g), st.buf, st.norms, g.adjacency,
            g.rep_ids, mask_dev, mesh=self.mesh, metric=int(metric),
            beam_width=int(beam_width), expand=int(expand),
            max_iters=int(iters or beam_width), num_seeds=32,
            term_width=int(term_width), k=int(k),
            tail_start=int(g.num_rows // st.n_shards),
            has_tail=bool(tail), compact=int(compact),
            fused=None if fused is None else fused[0],
            scale=None if fused is None else fused[1], pack_out=True,
            packed_gb=packed_gb)

    @staticmethod
    def fetch(dev) -> np.ndarray:
        """Blocking fetch of launch() handles -> [B, k] global ids."""
        d_h, ids_h = jax.device_get(dev)  # one round trip
        ids_h = ids_h.astype(np.int64)
        ids_h[~np.isfinite(d_h)] = -1
        return ids_h

    def search(self, queries_padded: np.ndarray, valid: np.ndarray,
               metric: MetricType, k: int, use_graph: bool,
               beam_width: int, expand: int, term_width: int,
               mask_version: Optional[int] = None,
               compact: int = 0, shard_filter=None,
               fused=None, iters: int = 0) -> np.ndarray:
        """[B, Dp] padded queries -> [B, k] global candidate ids (-1 pad)."""
        return self.fetch(self.launch(
            queries_padded, valid, metric, k, use_graph, beam_width,
            expand, term_width, mask_version, compact,
            shard_filter=shard_filter, fused=fused, iters=iters))
