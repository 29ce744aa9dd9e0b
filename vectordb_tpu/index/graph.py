"""ANN graph index: exact-KNN candidate generation + occlusion pruning.

TPU-native replacement for the reference's KNN-graph + NSG build
(/root/reference/engine/db/ann_graph_segment.cpp:201-242,
db/index/nsg/nsg.cpp:45-99): the CSR adjacency becomes a fixed-degree padded
`int32[N, R]` matrix (padding = -1) so traversal batches onto the MXU, and
each build stage is a batched device kernel instead of per-node OpenMP loops:

  1. exact KNN graph via blocked MXU matmuls (ops/knn.py) — replaces
     NN-Descent (knn/nndescent.hpp) with a higher-quality exact neighborhood;
  2. navigation point = row nearest the centroid (nsg.cpp:101-155);
  3. occlusion pruning (the reference's SelectEdge rule, nsg.cpp:655-685,
     generalized with Vamana's alpha) vectorized over node batches: one
     [B, P, P] pairwise-distance block per batch + a lax.scan greedy select;
  4. reverse-edge insertion (InterInsert, nsg.cpp:583-653) as a host-side
     rank-capped scatter into the padded slack;
  5. connectivity repair (CheckConnectivity, nsg.cpp:687-775) as a host BFS
     from the navigation point, re-attaching stragglers through their
     nearest already-connected KNN neighbor.
"""
from __future__ import annotations

import functools
import json
import os
import weakref
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..logger import logger
from ..ops.knn import exact_knn
from ..schema import MetricType
from ..utils import atomic_write_bytes

# Every constructed GraphIndex, for cross-field resident-HBM accounting in
# _free_hbm_bytes (weak: dropped tables release their graphs to GC).
_LIVE_GRAPHS: "weakref.WeakSet" = weakref.WeakSet()

# Build defaults; reference NSG uses K=100/out_degree=50
# (ann_graph_segment.cpp:28-29). Degree 32 + alpha 1.2 + reverse slack
# reaches recall@10 >= 0.99 at beam 128 on SIFT-class data with a cheaper
# build and traversal.
DEFAULT_KNN_K = 64
DEFAULT_DEGREE = 32
DEFAULT_ALPHA = 1.2
PRUNE_BATCH = 2048
# Coarse entry-point cover: every search seeds from its top representatives
# (one small MXU block), so navigation never depends on a single entry
# point's basin. Cover size scales with the table; the cap trades the
# [B, S] rep-scan block + top_k against navigation quality. Truncating the
# cover collapses recall on clustered data (measured: 16384 -> 1024 reps
# at 500k drops recall@10 from 0.993 to 0.29 with no speedup), and 10M
# rows at the old 16384 cap (1 rep per 610 rows) lost ~1.5 recall points,
# so the cap grows with the table up to 49152.
MIN_REPS = 1024
MID_REPS = 16384          # n/16 cap up to ~2.6M rows (measured regime)
MAX_REPS = 49152


def resolve_build_search_params() -> Tuple[int, int]:
    """Pool-search (beam L, iterations) for the build stage: explicit
    config values win; 0 means auto, which is (24, 8) at every scale.

    Auto policy (measured, benchmarks/build_param_sweep_500k.jsonl and
    scale_results.jsonl): (24, 8) produces graphs with final recall
    IDENTICAL to (64, 24) at 500k x 128 (1.0 / 1.0), 500k x 960
    (1.0 / 1.0) and 10M x 96 (0.9938 / 0.9938) while roughly halving the
    pool stage — the build's linear cost and the dominant term above the
    exact-KNN scale.
    """
    from ..config import global_config as _cfg

    sl = int(getattr(_cfg, "build_search_l", 0) or 0)
    it = int(getattr(_cfg, "build_search_iters", 0) or 0)
    if sl <= 0:
        sl = 24
    if it <= 0:
        it = 8
    return sl, it


def _rep_count(n: int) -> int:
    s = int(min(MID_REPS, max(MIN_REPS, n // 16)))
    if n > MID_REPS * 16:  # grow as sqrt(N) past the measured regime
        s = int(min(MAX_REPS, MID_REPS * (n / (MID_REPS * 16)) ** 0.5))
    return min(s, n)


# Cover k-means is capped here: the full-table assignment materializes a
# [8192, C] f32 block per step (512 MB at 16384) and Lloyd cost grows
# linearly in C; past the cap the remainder of the rep budget is filled
# randomly (the cover already guarantees every basin has a seed).
COVER_MAX_CENTROIDS = 16384


def _cover_rep_ids(table, n: int, s: int, nav: int = -1) -> np.ndarray:
    """One member row per k-means cluster: a true epsilon-net cover.

    Uniform-random reps miss small isolated clusters with probability
    ~exp(-cluster_size * S / N) — measured at 200k x 128 clustered
    (3000 centers): 2/256 self-queries had NO rep within 3x their
    cluster radius (best rep d=779 vs true top-10 at d<=230) and greedy
    descent never recovered, capping recall at 0.992 at ANY beam width.
    k-means centroids place one seed in every basin by construction."""
    from ..ops.ivf import _assign_all, _kmeans_iters

    c_real = min(s, COVER_MAX_CENTROIDS)
    c = -(-c_real // 128) * 128
    samp = min(n, max(16 * c_real, 4096))
    samp_ids = np.linspace(0, n - 1, samp).astype(np.int64)
    s_pad = -(-samp // 1024) * 1024
    samp_pad = np.zeros(s_pad, np.int64)
    samp_pad[:samp] = samp_ids
    sample = jnp.take(table, jnp.asarray(samp_pad.astype(np.int32)), axis=0)
    init_ids = np.linspace(0, samp - 1, c_real).astype(np.int32)
    cent0 = np.full((c, table.shape[1]), 1e15, np.float32)
    cent0[:c_real] = np.asarray(
        jnp.take(sample, jnp.asarray(init_ids), axis=0), dtype=np.float32)
    s_norms = jnp.sum(sample.astype(jnp.float32) ** 2, axis=1)
    centroids = _kmeans_iters(sample, s_norms, jnp.asarray(cent0), samp,
                              1024, 4)
    blk = min(8192, table.shape[0])
    while table.shape[0] % blk:
        blk //= 2
    a1 = _assign_all(table, centroids, n, blk)
    a1 = np.asarray(a1)[:n]
    uniq, first = np.unique(a1, return_index=True)
    first = first.astype(np.int32)
    if 0 <= nav < n and nav not in first:
        # The navigation point must be a seed (reference PrepareInitIds
        # role). Substituting it for its OWN cluster's seed keeps the
        # one-seed-per-basin cover property — overwriting an arbitrary
        # slot would leave that slot's basin unseeded, re-creating the
        # exact stranding failure the cover exists to fix.
        first[np.searchsorted(uniq, a1[nav])] = nav
    return first  # one member row per cluster


def _make_rep_ids(n: int, nav: int, table=None) -> np.ndarray:
    """Representative seed rows. With a device `table` available and a
    large-enough budget, reps are a k-means COVER (one per basin — see
    _cover_rep_ids for the measured failure of random reps); otherwise
    (tiny tables, no device view) a deterministic random sample."""
    s = _rep_count(n)
    rng = np.random.default_rng(0)  # deterministic
    reps = None
    if table is not None and s >= 256 and n >= 4 * s:
        try:
            reps = _cover_rep_ids(table, n, s, nav)
        except Exception as e:  # cover is an optimization, never fatal
            logger.warning(f"cover reps failed ({e}); random fallback")
    if reps is None:
        reps = rng.choice(n, size=s, replace=False).astype(np.int32)
        if nav not in reps:
            reps[0] = nav  # random seeds carry no per-slot cover role
        return reps
    if reps.size < s:
        # Fill the remaining budget with UNIQUE rows outside the cover:
        # duplicate rep ids seed duplicate beam entries, and the grouped
        # device-rerank path returns them as duplicate top-k rows (no
        # host dedup stage there). n >= 4*s, so one oversized draw
        # almost always suffices; the loop bounds the pathological case.
        need = s - reps.size
        extras = np.empty(0, np.int32)
        taken = reps
        while extras.size < need:
            cand = rng.choice(n, size=min(n, 2 * need + 64),
                              replace=False).astype(np.int32)
            cand = cand[~np.isin(cand, taken)]
            extras = np.concatenate([extras, np.unique(cand)])[:need]
            taken = np.concatenate([reps, extras])
        reps = np.concatenate([reps, extras])
    return reps[:s]


@functools.partial(jax.jit, static_argnames=("metric", "pool_size"))
def _pool_kernel(node_ids, node_vecs, beam_ids, visited_ids, knn_batch,
                 table, norms, metric: int, pool_size: int):
    """Assemble each node's pruning pool: search results U search path U
    exact KNN, deduped, self-excluded, sorted ascending by distance.

    This is the TPU equivalent of NSG's GetNeighbors fullset
    (nsg.cpp:158-486): the beam search path from the navigation point
    contributes the long-range edges that make the graph navigable.
    Returns (pool_ids [B, P] int32, pool_d [B, P] f32).
    """
    b = node_ids.shape[0]
    cand = jnp.concatenate([beam_ids, visited_ids, knn_batch], axis=1)
    cand = jnp.where(cand == node_ids[:, None], -1, cand)
    safe = jnp.clip(cand, 0, table.shape[0] - 1)
    p_all = cand.shape[1]
    vecs = jnp.take(table, safe.reshape(-1), axis=0).reshape(b, p_all, -1)
    v_norms = jnp.take(norms, safe.reshape(-1), axis=0).reshape(b, p_all)
    q_norms = jnp.sum(node_vecs.astype(jnp.float32) ** 2, axis=1)
    ip = jnp.einsum("bpd,bd->bp", vecs, node_vecs.astype(vecs.dtype),
                    preferred_element_type=jnp.float32)
    if metric == int(MetricType.EUCLIDEAN):
        d = q_norms[:, None] - 2.0 * ip + v_norms
    elif metric == int(MetricType.COSINE):
        d = 1.0 - ip
    else:
        d = -ip
    first_pos = jnp.argmax(cand[:, :, None] == cand[:, None, :], axis=2)
    dup = first_pos != jax.lax.broadcasted_iota(jnp.int32, (b, p_all), 1)
    d = jnp.where((cand < 0) | dup, jnp.inf, d)
    sd, sids = jax.lax.sort((d, cand), dimension=1, num_keys=1)
    return sids[:, :pool_size], sd[:, :pool_size]


def _build_batch_body(start, table, norms, boot_adj, boot_reps, knn_ids,
                      alpha, metric: int, degree: int, pool_size: int,
                      search_l: int, search_iters: int, batch: int):
    """Build stage for one node batch at a DYNAMIC offset: beam-search the
    pools over the bootstrap graph, assemble + prune. Traced once — jitted
    directly (_build_batch_kernel) and inside the grouped scan
    (_build_batch_group)."""
    from ..ops.beam import beam_search_kernel

    node_vecs = jax.lax.dynamic_slice(
        table, (start, 0), (batch, table.shape[1])).astype(jnp.float32)
    node_ids = start + jnp.arange(batch, dtype=jnp.int32)
    # Early-terminated search: the pool needs the PATH to the node's
    # neighborhood, not full convergence. compact = 0.75 * expand*degree
    # (the pool stage is gather-bound; see ops/beam.py).
    _, s_ids, s_vis = beam_search_kernel(
        node_vecs, table, norms, boot_adj, boot_reps, metric, search_l, 4,
        search_iters, term_width=16, compact=3 * boot_adj.shape[1])
    knn_b = jax.lax.dynamic_slice(
        knn_ids, (start, 0), (batch, knn_ids.shape[1]))
    pool_ids, pool_d = _pool_kernel(node_ids, node_vecs, s_ids, s_vis,
                                    knn_b, table, norms, metric, pool_size)
    safe = jnp.clip(pool_ids, 0, table.shape[0] - 1)
    pool_vecs = jnp.take(table, safe.reshape(-1),
                         axis=0).reshape(batch, pool_size, -1)
    kept = _prune_batch_kernel(pool_vecs, pool_d, jnp.isfinite(pool_d),
                               metric, degree, alpha)
    return _extract_fwd(pool_ids, kept, degree)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "degree", "pool_size", "search_l",
                     "search_iters", "batch"))
def _build_batch_kernel(start, table, norms, boot_adj, boot_reps, knn_ids,
                        alpha, metric: int, degree: int, pool_size: int,
                        search_l: int, search_iters: int, batch: int):
    return _build_batch_body(start, table, norms, boot_adj, boot_reps,
                             knn_ids, alpha, metric, degree, pool_size,
                             search_l, search_iters, batch)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "degree", "pool_size", "search_l",
                     "search_iters", "batch", "group"))
def _build_batch_group(start0, table, norms, boot_adj, boot_reps, knn_ids,
                       alpha, metric: int, degree: int, pool_size: int,
                       search_l: int, search_iters: int, batch: int,
                       group: int):
    """`group` consecutive build batches in ONE dispatch (lax.scan over
    the batch body). Dispatch latency through a tunneled relay dominates
    a 245-launch build loop; grouping cuts launches ~group-fold at the
    same compile cost (the scan body compiles once)."""

    def step(_, gi):
        fwd = _build_batch_body(start0 + gi * batch, table, norms,
                                boot_adj, boot_reps, knn_ids, alpha,
                                metric, degree, pool_size, search_l,
                                search_iters, batch)
        return None, fwd

    _, fwd = jax.lax.scan(step, None, jnp.arange(group, dtype=jnp.int32))
    return fwd.reshape(group * batch, fwd.shape[-1])


def _extract_fwd(pool_ids, kept, degree: int):
    """Selected pool entries -> padded forward-edge rows [B, degree], on
    device (fetching the full pool/kept arrays costs 5x the transfer)."""
    key = jnp.where(kept, 0, 1).astype(jnp.int32)
    _, sel = jax.lax.sort((key, pool_ids), dimension=1, num_keys=1,
                          is_stable=True)
    sel = sel[:, :degree]
    counts = jnp.sum(kept, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    return jnp.where(col < counts[:, None], sel, -1)


@functools.partial(
    jax.jit, static_argnames=("metric", "degree", "batch", "group"))
def _knn_prune_batch_kernel(start0, table, norms, knn_ids, alpha,
                            metric: int, degree: int, batch: int,
                            group: int = 1):
    """Build-batch kernel for KNN-only pools (no search stage): prune each
    node's exact-KNN list directly, `group` node batches per dispatch
    (lax.scan — launch count is the real cost through the relay). Used
    when query-time rep seeding makes long-range navigation edges
    unnecessary (measured at 500k x 128: recall and QPS identical to the
    pool-search build, 10x less build time). Node->candidate distances
    are recomputed in-kernel (ip from gathered rows + the precomputed f32
    norms table) — cheaper than round-tripping an [N, K] f32 distance
    matrix through the relay for the IVF path (2.5 GB each way at 10M)."""

    def step(_, gi):
        start = start0 + gi * batch
        ids_b = jax.lax.dynamic_slice(
            knn_ids, (start, 0), (batch, knn_ids.shape[1]))
        node_vecs = jax.lax.dynamic_slice(
            table, (start, 0), (batch, table.shape[1])).astype(jnp.float32)
        safe = jnp.clip(ids_b, 0, table.shape[0] - 1)
        pool_vecs = jnp.take(table, safe.reshape(-1),
                             axis=0).reshape(batch, ids_b.shape[1], -1)
        ip = jnp.einsum("bpd,bd->bp", pool_vecs,
                        node_vecs.astype(pool_vecs.dtype),
                        preferred_element_type=jnp.float32)
        if metric == int(MetricType.EUCLIDEAN):
            # q_norms: contiguous f32 slice (cheap, exact). v_norms:
            # computed from the gathered rows — a second [B, P] norms
            # GATHER would cost as much as the vector gather itself
            # (row gathers are row-count-bound on this hardware; see
            # ops/beam._cand_scores), and occlusion pruning is
            # insensitive to the bf16 rounding.
            q_norms = jax.lax.dynamic_slice(norms, (start,), (batch,))
            v_norms = jnp.einsum("bpd,bpd->bp", pool_vecs, pool_vecs,
                                 preferred_element_type=jnp.float32)
            d_b = q_norms[:, None] - 2.0 * ip + v_norms
        elif metric == int(MetricType.COSINE):
            d_b = 1.0 - ip
        else:
            d_b = -ip
        kept = _prune_batch_kernel(pool_vecs, d_b, ids_b >= 0,
                                   metric, degree, alpha)
        return None, _extract_fwd(ids_b, kept, degree)

    _, fwd = jax.lax.scan(step, None, jnp.arange(group, dtype=jnp.int32))
    return fwd.reshape(group * batch, fwd.shape[-1])


@functools.partial(jax.jit, static_argnames=("metric", "degree"))
def _prune_batch_kernel(pool_vecs, pool_d, pool_valid, metric: int,
                        degree: int, alpha: float):
    """Greedy occlusion select over each node's candidate pool.

    pool_vecs: [B, P, D] candidate vectors (sorted ascending by pool_d)
    pool_d:    [B, P] f32 distance node -> candidate
    pool_valid:[B, P] bool
    Returns selected mask [B, P] (at most `degree` True per row).

    Rule (SelectEdge occlusion, nsg.cpp:655-685 / Vamana alpha-RNG):
    candidate j survives iff d(node, j) < alpha * d(s, j) for every
    already-selected s.
    """
    b, p, dd = pool_vecs.shape
    # Pairwise distances among pool members, one MXU block per node.
    ip = jnp.einsum("bpd,bqd->bpq", pool_vecs, pool_vecs,
                    preferred_element_type=jnp.float32)
    if metric == int(MetricType.EUCLIDEAN):
        sq = jnp.einsum("bpd,bpd->bp", pool_vecs, pool_vecs,
                        preferred_element_type=jnp.float32)
        pw = sq[:, :, None] - 2.0 * ip + sq[:, None, :]
    elif metric == int(MetricType.COSINE):
        pw = 1.0 - ip
    else:
        pw = -ip

    def step(state, j):
        run_min, count = state
        keep = (pool_valid[:, j] & (count < degree)
                & (pool_d[:, j] < alpha * run_min[:, j]))
        run_min = jnp.where(keep[:, None],
                            jnp.minimum(run_min, pw[:, j, :]), run_min)
        count = count + keep.astype(jnp.int32)
        return (run_min, count), keep

    init = (jnp.full((b, p), jnp.inf, dtype=jnp.float32),
            jnp.zeros((b,), dtype=jnp.int32))
    _, kept = jax.lax.scan(step, init, jnp.arange(p))
    return kept.T  # [B, P]


def finalize_adjacency(fwd: np.ndarray, host: np.ndarray,
                       norms_h: np.ndarray, n: int, degree: int,
                       r_total: int, rep_ids: np.ndarray
                       ) -> Tuple[np.ndarray, int]:
    """Host-side build tail shared by single-chip and sharded builds:
    reverse-edge insertion into the padded slack (InterInsert,
    nsg.cpp:583-653) + connectivity repair from the representative cover
    (CheckConnectivity, nsg.cpp:687-775). Returns (adjacency [n, r_total],
    number of bridged components)."""
    adjacency = np.full((n, r_total), -1, dtype=np.int32)
    adjacency[:, :degree] = fwd
    from ..native import get_native

    native = get_native()
    if native is not None and hasattr(native, "reverse_edges"):
        fill = native.reverse_edges(fwd, adjacency, degree, r_total)
    else:
        fill = (fwd >= 0).sum(axis=1).astype(np.int64)
        src = np.repeat(np.arange(n, dtype=np.int32), degree)
        dst = fwd.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        order = np.argsort(dst, kind="stable")
        dsts, srcs = dst[order], src[order]
        uniq, first_idx, cnt = np.unique(dsts, return_index=True,
                                         return_counts=True)
        rank = np.arange(len(dsts)) - np.repeat(first_idx, cnt)
        slots = fill[dsts] + rank
        in_range = slots < r_total
        adjacency[dsts[in_range], slots[in_range]] = srcs[in_range]
        fill = (adjacency >= 0).sum(axis=1).astype(np.int64)

    bfs_scratch = (np.empty(n, dtype=np.int32)
                   if native is not None and getattr(native, "has_bfs",
                                                     False) else None)

    def absorb(start_ids, reached):
        if bfs_scratch is not None:
            # Native queue BFS: one linear pass over the edges. The numpy
            # fallback materializes an [frontier, r_total] gather + unique
            # sort per level — GBs of transients at 10M rows.
            native.bfs_reach(
                adjacency, np.ascontiguousarray(start_ids, dtype=np.int32),
                reached.view(np.uint8), bfs_scratch)
            return
        frontier = np.asarray(start_ids, dtype=np.int64)
        reached[frontier] = True
        while len(frontier):
            nxt = adjacency[frontier].reshape(-1)
            nxt = nxt[nxt >= 0]
            nxt = np.unique(nxt)
            nxt = nxt[~reached[nxt]]
            reached[nxt] = True
            frontier = nxt

    def add_edge(u, v):
        f = fill[u]
        slot = f if f < r_total else r_total - 1
        adjacency[u, slot] = v
        fill[u] = min(f + 1, r_total)

    reached = np.zeros(n, dtype=bool)
    absorb(rep_ids, reached)
    n_components = 0
    while not reached.all():
        u0 = int(np.argmin(reached))  # first unreached node
        d = norms_h - 2.0 * (host @ host[u0])
        d[~reached] = np.inf
        v = int(np.argmin(d))
        add_edge(v, u0)
        add_edge(u0, v)
        absorb([u0], reached)
        n_components += 1
    return adjacency, n_components


class GraphIndex:
    """Immutable fixed-degree search graph over rows [0, num_rows) of a
    dense vector column (the reference's ANNGraphSegment role)."""

    def __init__(self, segment, field_name: str, metric: MetricType,
                 adjacency_host: np.ndarray, nav_point: int, num_rows: int,
                 rep_ids_host: Optional[np.ndarray] = None):
        self.segment = segment
        self.field_name = field_name
        self.metric = metric
        self.adjacency_host = adjacency_host  # [num_rows, R_total] int32
        self.nav_point = int(nav_point)
        self.num_rows = int(num_rows)
        self._adjacency_dev = None
        self._rep_ids_dev = None
        self._table_f32 = None
        if rep_ids_host is not None:  # build/persisted cover reps
            self.rep_ids_host = np.asarray(rep_ids_host, dtype=np.int32)
        else:  # legacy artifact: recompute (cover when the store exists)
            tab = None
            try:
                tab = segment.device_view(field_name).buf
            except Exception:
                pass
            self.rep_ids_host = _make_rep_ids(num_rows, nav_point, tab)
        _LIVE_GRAPHS.add(self)

    # Device views -----------------------------------------------------

    @property
    def adjacency(self):
        if self._adjacency_dev is None:
            self._adjacency_dev = jnp.asarray(self.adjacency_host)
        return self._adjacency_dev

    def adjacency_traversal(self, r_used: int):
        """Device adjacency truncated to the first r_used columns (forward
        edges sort first; trimming part of the reverse slack cuts gathered
        rows per expansion — row gathers are the traversal cost). Cached
        per width."""
        r_total = self.adjacency_host.shape[1]
        if r_used <= 0 or r_used >= r_total:
            return self.adjacency
        cache = getattr(self, "_adj_trav_cache", None)
        if cache is None:
            cache = self._adj_trav_cache = {}
        hit = cache.get(r_used)
        if hit is None:
            hit = jnp.asarray(
                np.ascontiguousarray(self.adjacency_host[:, :r_used]))
            cache[r_used] = hit
        return hit

    @property
    def rep_ids(self):
        if self._rep_ids_dev is None:
            self._rep_ids_dev = jnp.asarray(self.rep_ids_host)
        return self._rep_ids_dev

    @property
    def table(self):
        return self.segment.device_view(self.field_name).buf

    @property
    def norms(self):
        return self.segment.device_view(self.field_name).norms

    def _resident_device_bytes(self, include_f32_reserve: bool) -> int:
        """Engine-resident device bytes attributable to this graph's field:
        the bf16 store buffer + norms, the adjacency (uploaded lazily but
        inevitably), any truncated-adjacency views, the fused traversal
        tables, and the f32 re-rank copy. `include_f32_reserve` additionally
        reserves the NOT-yet-materialized f32 copy's size (grouped query
        mode materializes it after the fused table, so the fused gate must
        leave room for it). Reads the raw device store WITHOUT sync (this
        is accounting, not a search; other fields' accounting must not
        trigger their uploads)."""
        store = self.segment.dense_device[self.field_name]
        total = ((store.buf.nbytes if store.buf is not None else 0)
                 + (store.norms.nbytes if store.norms is not None else 0))
        total += (self._adjacency_dev.nbytes
                  if self._adjacency_dev is not None
                  else self.adjacency_host.nbytes)
        for arr in getattr(self, "_adj_trav_cache", {}).values():
            total += arr.nbytes
        for entry in getattr(self, "_fused_cache", {}).values():
            if entry[0] is not None:
                total += entry[0].nbytes
        n, dp = self.num_rows, store.dim_padded
        npad = -(-n // 1024) * 1024
        if self._table_f32 is not None:
            total += self._table_f32.nbytes
        elif include_f32_reserve:
            total += npad * dp * 4
        return total

    def _free_hbm_bytes(self, include_f32_reserve: bool = False):
        """Best-effort free HBM: live backend stats when available, else
        `DeviceHbmBytes` (config; 0 = unknown) minus the resident device
        buffers of EVERY live graph/field (advisor r3: counting only this
        field over-admitted when several vector fields/tables share one
        device). The axon backend reports no memory_stats, so the
        configured-total path is what actually guards tunneled TPUs.
        Returns (free_bytes, live: bool); free is None when unknowable."""
        from ..utils import device_hbm_stats
        stats = device_hbm_stats()
        if stats is not None:
            return stats[1] - stats[0], True
        from ..config import global_config
        total = int(getattr(global_config, "device_hbm_bytes", 0))
        if total <= 0:
            return None, False
        resident = 0
        for g in list(_LIVE_GRAPHS):
            try:
                resident += g._resident_device_bytes(
                    include_f32_reserve and g is self)
            except Exception:  # torn-down segment mid-drop: skip it
                pass
        return total - resident, False

    def table_f32(self, max_bytes: int):
        """Immutable f32 device copy of the graph's rows for ON-DEVICE
        exact re-rank (ops/beam._exact_rerank_device). The store buffer is
        bf16 for MXU throughput; re-ranking needs unrounded values, so a
        second f32 view is kept — rows are frozen at build time (the graph
        never covers later inserts), so it never re-syncs. Uploaded in
        <=128 MB donated slices (single multi-GB h2d transfers stall
        through tunneled relays). Returns None when the copy would exceed
        max_bytes (HBM guardrail) — callers fall back to host re-rank."""
        if self._table_f32 is not None:
            return self._table_f32
        store = self.segment.device_view(self.field_name)
        n, dp = self.num_rows, store.dim_padded
        npad = -(-n // 1024) * 1024
        need = npad * dp * 4
        if need > max_bytes:
            return None
        # HBM check on top of the static budget: near-capacity pressure
        # wedges this backend instead of erroring, and the f32 view is
        # optional (host re-rank is the fallback). Live stats use a 0.6
        # headroom (unknown co-residents); the configured-total estimate
        # enumerates residents explicitly, so 0.65 is still conservative.
        free, live = self._free_hbm_bytes()
        if free is not None and need > (0.6 if live else 0.65) * free:
            logger.info(f"table_f32 gated off: need {need / 1e9:.2f} GB, "
                        f"free~{free / 1e9:.2f} GB ({'live' if live else 'cfg'})")
            return None
        import jax

        host = self.segment.dense_host[self.field_name]
        rows_per_slice = max(1024, (128 << 20) // (dp * 4) // 1024 * 1024)
        buf = jnp.zeros((npad, dp), jnp.float32)
        upd = jax.jit(
            lambda b, r, s: jax.lax.dynamic_update_slice(b, r, (s, 0)),
            donate_argnums=0)
        for s in range(0, n, rows_per_slice):
            e = min(s + rows_per_slice, n)
            rows = np.zeros((e - s, dp), np.float32)
            rows[:, : store.dim] = host[s:e]
            buf = upd(buf, jnp.asarray(rows), s)
        self._table_f32 = buf
        return buf

    def fused_traversal(self, r_used: int, max_bytes: int,
                        forced: bool = False):
        """Fused traversal table: `(fused [N_pad, r*Dp] int8 device array,
        dequant scale)` where row i inlines the int8-quantized vectors of
        node i's first `r` traversal neighbors (CAGRA-Q-style layout).

        Why: XLA row gathers are row-COUNT bound on this hardware
        (~70-180M rows/s regardless of row bytes, benchmarks/
        gather_micro.py), so the beam kernel's per-iteration cost is the
        [B*compact]-row candidate vector gather. Fetching the vectors
        inline with the adjacency cuts that to [B*expand] rows — measured
        6x+ per-iteration speedup at 500k x 128
        (benchmarks/fused_gather_micro.py). The int8 rounding (~0.2%
        median relative distance error, global max-abs scale) only
        perturbs navigation; final ordering is repaired by the exact
        re-rank. No reference analogue — the reference traverses a
        pointer-chasing CSR with scalar distance calls
        (vec_search_executor.cpp:384-444).

        Memory: N * r * Dp bytes of HBM (3 GB at 500k x 128 x 48) — gated
        by `max_bytes` AND a live free-HBM check (near-capacity pressure
        wedges this backend instead of erroring). Returns (None, None)
        when gated off; the caller falls back to the split gather path.
        The decision and the table are cached per r (graph rows are
        frozen at build time)."""
        r_total = self.adjacency_host.shape[1]
        r = r_used if 0 < r_used < r_total else r_total
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if r in cache and cache[r][0] is not None:
            return cache[r]  # built tables are immutable: always valid
        # Denials are cached per (forced, budget): a deny recorded under
        # FusedTraversal="auto" must NOT satisfy a later forced A/B call
        # or a raised budget — that silently measures the wrong path
        # (the advisor-r3 failure mode the `forced` override exists for).
        deny_key = (r, bool(forced), int(max_bytes))
        if deny_key in cache:
            return cache[deny_key]
        store = self.segment.device_view(self.field_name)
        n, dp, dim = self.num_rows, store.dim_padded, store.dim
        npad = -(-n // 1024) * 1024
        row_w = r * dp
        need = npad * row_w
        deny = (None, None)
        if need > max_bytes:
            cache[deny_key] = deny
            return deny
        # Reserve room for the f32 re-rank copy (materialized AFTER the
        # fused table in grouped mode) so fusing can't starve it.
        free, live = self._free_hbm_bytes(include_f32_reserve=True)
        if free is not None and need > (0.55 if live else 0.65) * free:
            if forced and not live:
                # FusedTraversal="on" is an explicit A/B directive; the
                # cfg-estimate gate is a guess (DeviceHbmBytes default
                # minus this field's buffers), so honor the operator and
                # say so loudly instead of silently measuring the split
                # path (advisor r3).
                logger.warning(
                    f"fused traversal FORCED past cfg-estimate HBM gate: "
                    f"need {need / 1e9:.2f} GB, free~{free / 1e9:.2f} GB")
            else:
                msg = (f"fused traversal gated off: need {need / 1e9:.2f} "
                       f"GB, free~{free / 1e9:.2f} GB "
                       f"({'live' if live else 'cfg'})")
                # warning when a forced A/B is being overridden by LIVE stats
                (logger.warning if forced else logger.info)(msg)
                cache[deny_key] = deny
                return deny

        host = self.segment.dense_host[self.field_name][:n]
        scale = float(np.abs(host).max()) / 127.0
        if not np.isfinite(scale) or scale <= 0.0:
            scale = 1.0
        x_q = np.clip(np.round(host / scale), -127, 127).astype(np.int8)
        adj = np.clip(self.adjacency_host[:, :r], 0, n - 1)

        # Sliced donated upload (single multi-GB h2d transfers stall
        # through tunneled relays — same protocol as table_f32).
        rows_per = max(1024, (128 << 20) // max(row_w, 1) // 1024 * 1024)
        buf = jnp.zeros((npad, row_w), jnp.int8)
        upd = jax.jit(
            lambda b_, r_, s_: jax.lax.dynamic_update_slice(b_, r_, (s_, 0)),
            donate_argnums=0)
        for s in range(0, n, rows_per):
            e = min(s + rows_per, n)
            block = np.zeros((e - s, r, dp), np.int8)
            block[:, :, :dim] = x_q[adj[s:e]]
            buf = upd(buf, jnp.asarray(block.reshape(e - s, row_w)), s)
        out = (buf, np.float32(scale))
        cache[r] = out
        return out

    # Build ------------------------------------------------------------

    @classmethod
    def build(cls, segment, field_name: str, metric: MetricType,
              knn_k: int = DEFAULT_KNN_K, degree: int = DEFAULT_DEGREE,
              alpha: float = DEFAULT_ALPHA,
              search_pools: Optional[bool] = None) -> "GraphIndex":
        import time as _time

        if search_pools is None:
            # Config policy: auto = KNN-only prune (measured identical
            # recall/QPS to the pool-search graph at ~10x less build time
            # — see config.build_search_pools); "on" restores pool search.
            from ..config import global_config as _gc
            search_pools = (getattr(_gc, "build_search_pools", "auto")
                            == "on")

        t_start = _time.perf_counter()
        # Device phases dispatch asynchronously, so by default the laps
        # measure dispatch and everything real drains into "fetch".
        # VDB_BUILD_PROFILE=1 blocks between phases for true phase times.
        profile = os.environ.get("VDB_BUILD_PROFILE") == "1"

        def _lap(phase, t=[None]):
            now = _time.perf_counter()
            if t[0] is not None:
                logger.debug(f"graph build phase {t[0][0]}: "
                             f"{now - t[0][1]:.2f}s")
            t[0] = (phase, now)

        _lap("sync")
        store = segment.device_view(field_name)
        n = segment.record_number
        knn_k = min(knn_k, n - 1)
        degree = min(degree, knn_k)

        # 1. KNN graph (MXU). Exact blocked scan up to the config
        #    threshold (O(N^2) in distance evaluations but stays on device
        #    and is minutes up to ~2M rows); above it, IVF-partitioned
        #    exact-over-probes (ops/ivf.py) keeps the build sub-quadratic
        #    (the role of the reference's NN-Descent at scale,
        #    knn/nndescent.hpp:76-192).
        _lap("knn")
        from ..config import global_config as _cfg
        if n >= getattr(_cfg, "ivf_knn_threshold", 3_000_000):
            from ..ops.ivf import ivf_knn
            # Distances are recomputed in-kernel by the prune stage, so
            # the [N, K] f32 matrix (2.5 GB at 10M) never crosses the
            # relay in either direction.
            ids_h, _ = ivf_knn(store.buf, store.norms, n, knn_k, metric,
                               n_probe=getattr(_cfg, "ivf_probes", 0),
                               need_dists=False)
            pad_n = -(-n // PRUNE_BATCH) * PRUNE_BATCH
            if pad_n > n:
                ids_h = np.pad(ids_h, ((0, pad_n - n), (0, 0)),
                               constant_values=-1)
            knn_ids = jnp.asarray(ids_h)
        else:
            knn_ids, _ = exact_knn(store.buf, store.norms, n, knn_k,
                                   metric)
        if profile:
            jax.block_until_ready(knn_ids)

        _lap("nav")
        # 2. Navigation point: nearest row to the centroid
        #    (nsg.cpp:101-155). Host numpy — one pass over the mirror is
        #    cheaper than compiling a device kernel for a single query.
        host = segment.dense_host[field_name][:n]
        centroid = host.mean(axis=0, dtype=np.float64).astype(np.float32)
        nav = int(np.argmin(
            segment.dense_norms[field_name][:n]
            - 2.0 * (host @ centroid)))

        # 3. Candidate pools via batched beam search from the navigation
        #    point over a bootstrap KNN graph (the role of NSG GetNeighbors,
        #    nsg.cpp:158-486), then occlusion pruning — all in node batches
        #    on device.
        r_total = degree * 2
        boot_adj = boot_reps = None
        pool_size = min(128, max(degree * 2, 64))
        search_l, search_iters = resolve_build_search_params()
        # Cover reps computed ONCE per build (device k-means; the store is
        # already synced): shared by the bootstrap searches, the repair
        # roots, and the query-time seeds via the constructor.
        reps_host = _make_rep_ids(n, nav, store.buf)
        if search_pools:
            # Bootstrap graph for pool searches: half degree halves the
            # gather volume of the (gather-bound) pool stage with
            # negligible pool quality impact.
            boot_deg = max(degree // 2, 16)
            knn_r = knn_ids[:, :boot_deg]
            if knn_r.shape[1] < boot_deg:
                knn_r = jnp.pad(knn_r,
                                ((0, 0), (0, boot_deg - knn_r.shape[1])),
                                constant_values=-1)
            boot_adj = jnp.where(knn_r >= 0, knn_r, -1).astype(jnp.int32)
            boot_reps = jnp.asarray(reps_host)

        # Fixed-size node batches at dynamic offsets -> exactly one compiled
        # executable for the whole loop; results accumulate on device and
        # are fetched once.
        _lap("pool+prune")
        n_rows_knn = knn_ids.shape[0]
        batch = min(PRUNE_BATCH, n_rows_knn)
        from ..utils import build_pause_gate

        fwd_parts = []
        start = 0
        group = 16
        # Grouped region: `group` batches per dispatch (launch count is a
        # real cost through the relay — see _build_batch_group), bounded
        # by the batches containing real rows so a group never prunes
        # mostly padding; the per-batch tail covers [start, n).
        n_batches_real = -(-n // batch) * batch
        while start + group * batch <= min(n_rows_knn, n_batches_real):
            build_pause_gate.check_wait()  # BuilderSuspend equivalent
            if search_pools:
                fwd_parts.append(_build_batch_group(
                    jnp.int32(start), store.buf, store.norms, boot_adj,
                    boot_reps, knn_ids, float(alpha), int(metric), degree,
                    pool_size, search_l, search_iters, batch, group))
            else:
                fwd_parts.append(_knn_prune_batch_kernel(
                    jnp.int32(start), store.buf, store.norms, knn_ids,
                    float(alpha), int(metric), degree, batch, group))
            start += group * batch
        for start in range(start, n_rows_knn, batch):
            build_pause_gate.check_wait()
            if start >= n:
                break
            real_start = start
            if start + batch > n_rows_knn:
                real_start = n_rows_knn - batch  # overlap tail, same shape
            if search_pools:
                fwd_b = _build_batch_kernel(
                    jnp.int32(real_start), store.buf, store.norms, boot_adj,
                    boot_reps, knn_ids, float(alpha), int(metric), degree,
                    pool_size, search_l, search_iters, batch)
            else:
                fwd_b = _knn_prune_batch_kernel(
                    jnp.int32(real_start), store.buf, store.norms, knn_ids,
                    float(alpha), int(metric), degree, batch, 1)
            if real_start != start:
                fwd_b = fwd_b[start - real_start:]
            fwd_parts.append(fwd_b)
        if profile and fwd_parts:
            jax.block_until_ready(fwd_parts)  # true pool+prune lap time
        # Fetch the pruned forward edges part-by-part: the relay transport
        # collapses on large single transfers (one [N, 32] fetch at 10M is
        # 1.28 GB ~ 20 min at the measured 1.1 MB/s big-transfer rate;
        # the same bytes in the parts' natural 4 MB slices sustain
        # 12-43 MB/s — see utils.fetch_to_host).
        _lap("fetch")
        from ..utils import fetch_to_host
        fwd = np.concatenate(
            [fetch_to_host(p) for p in fwd_parts], axis=0)[:n]
        fwd = np.ascontiguousarray(fwd, dtype=np.int32)
        _lap("edges")

        # 4+5. Reverse edges + connectivity repair (shared with the
        #      sharded build — see finalize_adjacency above).
        _lap("repair")
        norms_h = segment.dense_norms[field_name][:n]
        adjacency, n_components = finalize_adjacency(
            fwd, host, norms_h, n, degree, r_total, reps_host)
        if n_components:
            logger.info(f"Graph repair: bridged {n_components} disconnected "
                        "components")

        _lap("done")
        from ..metrics import metrics

        build_s = _time.perf_counter() - t_start
        metrics.inc("graph_builds_total")
        metrics.observe("graph_build", build_s)
        # Distance computations: n x n KNN block scan + the per-node
        # pool/prune term of whichever build path ran.
        per_node = (search_l * 4 + pool_size ** 2 if search_pools
                    else knn_k ** 2)
        metrics.inc("build_distance_computations",
                    float(n) * n + float(n) * per_node)
        logger.info(f"Graph build: {n} rows, degree {degree}x2, "
                    f"{build_s:.1f}s")
        return cls(segment, field_name, metric, adjacency, nav, n,
                   rep_ids_host=reps_host)

    # Persistence (role of ann_graph_<field>.bin,
    # ann_graph_segment.cpp:156-199). ------------------------------------

    def save(self, path: str) -> None:
        import io

        buf = io.BytesIO()
        np.savez(buf, adjacency=self.adjacency_host,
                 rep_ids=self.rep_ids_host,
                 meta=np.frombuffer(json.dumps({
                     "nav_point": self.nav_point,
                     "num_rows": self.num_rows,
                     "metric": int(self.metric),
                     "field": self.field_name,
                 }).encode("utf-8"), dtype=np.uint8))
        atomic_write_bytes(path, buf.getvalue())

    @classmethod
    def load(cls, path: str, segment, field_name: str) -> "GraphIndex":
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
            adjacency = z["adjacency"]
            # rep_ids persisted since r4 (cover reps are a device k-means;
            # recomputing on every load would cost seconds at 10M+).
            reps = z["rep_ids"] if "rep_ids" in z.files else None
        return cls(segment, field_name, MetricType(meta["metric"]),
                   adjacency, meta["nav_point"], meta["num_rows"],
                   rep_ids_host=reps)
