"""Flat (brute-force) distance scan + top-k, TPU-first.

This is the TPU-native replacement for the reference's OpenMP brute-force
scan (/root/reference/engine/db/execution/vec_search_executor.cpp:717-768)
and its SIMD distance kernels (db/index/distance_simd.cpp): a batch of
queries is scored against the whole table as MXU-tiled matmul blocks with the
deleted/filter bitmask and top-k selection fused in, streamed chunk-by-chunk
so the [B, N] distance matrix never materializes in HBM.

Distance conventions match the reference dispatch
(db/index/index.cpp:10-35):
  EUCLIDEAN   -> squared L2 (space_l2.hpp)
  COSINE      -> 1 - inner_product (space_cosine.hpp:13-16), vectors
                 normalized at ingest
  DOT_PRODUCT -> -inner_product (space_ip.hpp:8-20)
All three are "smaller is better".
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schema import MetricType

# Rows per streamed chunk. 8192 rows x 128 lanes fits VMEM comfortably and
# keeps the MXU busy with [B, D] x [D, 8192] blocks.
DEFAULT_CHUNK = 8192
# Use the single fused matmul + top_k whenever the [B, N] score matrix is
# modest (<= 1 GB f32); the streamed lax.scan variant exists only for huge
# B x N products — its program is far more expensive to compile.
SINGLE_PASS_MAX_ELEMS = 1 << 28


def _scores(q: jnp.ndarray, tab: jnp.ndarray, norms: Optional[jnp.ndarray],
            metric: int, precision=None) -> jnp.ndarray:
    """[B, D] x [chunk, D] -> [B, chunk] distance block (f32 accumulation).

    precision: None = backend default. NOTE the TPU default truncates f32
    matmul OPERANDS to bf16 (one MXU pass) — fine for candidate
    generation (the engine exact-re-ranks on host), WRONG for an exact
    oracle; pass jax.lax.Precision.HIGHEST (bf16x3 ~= true f32) there.
    """
    ip = jax.lax.dot_general(
        q, tab,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)
    if metric == int(MetricType.EUCLIDEAN):
        qn = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1,
                     keepdims=True)
        return qn - 2.0 * ip + norms[None, :]
    if metric == int(MetricType.COSINE):
        return 1.0 - ip
    return -ip  # DOT_PRODUCT


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "chunk", "precision"))
def _flat_topk_scan(q, table, norms, mask, metric: int, k: int, chunk: int,
                    precision=None):
    """Streamed scan over row chunks, carrying a running top-k."""
    n = table.shape[0]
    n_chunks = n // chunk
    b = q.shape[0]

    table_c = table.reshape(n_chunks, chunk, table.shape[1])
    mask_c = mask.reshape(n_chunks, chunk)
    if norms is not None:
        norms_c = norms.reshape(n_chunks, chunk)
    else:
        norms_c = jnp.zeros((n_chunks, chunk), jnp.float32)
    base_ids = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)

    init = (jnp.full((b, k), jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))

    def body(carry, xs):
        best_d, best_i = carry
        tab, nrm, msk, base = xs
        d = _scores(q, tab, nrm, metric, precision)
        d = jnp.where(msk[None, :], d, jnp.inf)
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, sel = jax.lax.top_k(-all_d, k)
        return (-neg_top, jnp.take_along_axis(all_i, sel, axis=1)), None

    # unroll=4: each lax.scan step costs ~1.5 ms of backend overhead on
    # top of its work (measured, benchmarks/iter_micro.py) — at 500k rows
    # that's 61 steps = ~90 ms of pure floor. 4x unrolling cuts it to a
    # quarter at bounded compile cost.
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (table_c, norms_c, mask_c, base_ids), unroll=4)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("metric", "k", "precision"))
def _flat_topk_single(q, table, norms, mask, metric: int, k: int,
                      precision=None):
    d = _scores(q, table, norms, metric, precision)
    d = jnp.where(mask[None, :], d, jnp.inf)
    neg_top, ids = jax.lax.top_k(-d, k)
    return -neg_top, ids


def flat_topk(queries: jnp.ndarray,
              table: jnp.ndarray,
              norms: Optional[jnp.ndarray],
              mask: jnp.ndarray,
              metric: MetricType,
              k: int,
              chunk: int = DEFAULT_CHUNK,
              precision=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused distance + top-k over an [N, D] device table.

    queries: [B, D] (f32 or bf16; cast to table dtype for the MXU block)
    table:   [N, D] device-resident, N padded to a chunk multiple
    norms:   [N] f32 squared row norms (EUCLIDEAN only; None otherwise)
    mask:    [N] bool — False rows (deleted / filtered / padding) are +inf
    Returns (distances [B, k] f32, ids [B, k] int32); masked-out slots have
    distance +inf and id -1 (single-pass path keeps arbitrary padded ids for
    +inf rows; callers must drop non-finite entries).
    """
    n = table.shape[0]
    k = min(k, n)
    q = queries.astype(table.dtype)
    if q.shape[0] * n <= SINGLE_PASS_MAX_ELEMS or n % chunk != 0:
        return _flat_topk_single(q, table, norms, mask, int(metric), k,
                                 precision)
    return _flat_topk_scan(q, table, norms, mask, int(metric), k, chunk,
                           precision)


# Survivor slack for the flat-serve path: re-rank top (k + slack)
# partial-min survivors so bf16 score quantization near the k-boundary
# never costs a true neighbor.
FLAT_SERVE_SLACK = 32


@functools.partial(jax.jit,
                   static_argnames=("metric", "k_cand", "k_out", "n_valid",
                                    "use_pallas", "pack_out", "packed_r"))
def flat_serve_grouped(q_flat, table, norms, mask, table_f32, metric: int,
                       k_cand: int, k_out: int, n_valid: int,
                       use_pallas: bool = True, pack_out: bool = True,
                       packed_r=None):
    """THROUGHPUT flat serving: a [G*B, Dp] query block against the whole
    device table in ONE program.

    TPU-first adaptive brute force: the reference cuts over to its OpenMP
    brute-force scan below 512 rows (vec_search_executor.hpp:28, the
    BruteForceThreshold default) because CPU scan cost grows linearly
    while graph traversal stays ~constant; on the MXU a fused full-table
    scan of a 100k-row bf16 table is CHEAPER than a tuned beam traversal
    (one [B,D]x[D,N] systolic pass vs hundreds of row gathers), so the
    cutover moves up three orders of magnitude. Recall is near-exact
    (the only loss is partial-min shadowing of a THIRD top-k candidate
    co-located in one strided 64-column group — the kernel keeps best +
    second-best per group, so pairwise co-location costs nothing) and
    needs NO tuning.

    Pipeline (all on device):
      1. Pallas fused distance + partial-min scan (ops/pallas_topk) —
         scores never materialize in HBM; [GB, N/fold] survivors out.
         (use_pallas=False: plain masked MXU scores, CPU/test fallback.)
      2. exact top-k_cand over survivors.
      3. exact f32 re-rank of the k_cand candidates (beam's
         _exact_rerank_device) -> top-k_out with EXACT distances.
      4. optional packed int32 wire encode ([GB, 2*k_out], distance BITS
         in [:k], ids in [k:] — see beam.unpack_wire for why int32).

    mask: [N_pad] bool/f32 validity x filter mask (False/0 = excluded);
    n_valid: static valid-row bound for the Pallas kernel — pass the
    device CAPACITY (mask already excludes rows >= record_number, and a
    capacity bound keeps the executable stable across inserts).
    table_f32: optional [N_pad, Dp] f32 view for the exact re-rank; when
    None the k_cand survivors are returned for the host re-rank.
    packed_r: static query-row count when q_flat is a PACKED int8 wire
    buffer (ops/qwire layout — one put per super-chunk; see
    beam_search_grouped).
    """
    if packed_r is not None:
        from . import qwire
        q_flat = qwire.decode_int8_queries(q_flat, packed_r,
                                           table.shape[1])
    qs = q_flat.astype(table.dtype)
    if use_pallas:
        from . import pallas_topk
        qf32 = q_flat.astype(jnp.float32)
        q_norms = jnp.sum(qf32 * qf32, axis=1)
        vals, vids = pallas_topk.partial_min_scan(
            qs, q_norms, jnp.int32(0), table, norms, metric,
            n_valid=n_valid, mask=mask.astype(jnp.float32))
    else:
        d = _scores(qs, table,
                    norms if metric == int(MetricType.EUCLIDEAN) else None,
                    metric)
        vals = jnp.where(mask.astype(bool)[None, :], d, jnp.inf)
        vids = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    kc = min(k_cand, vals.shape[1])
    neg, sel = jax.lax.top_k(-vals, kc)
    cd = -neg
    cids = jnp.where(jnp.isfinite(cd),
                     jnp.take_along_axis(vids, sel, axis=1), -1)
    if table_f32 is not None:
        from . import beam as beam_ops
        d_out, i_out = beam_ops._exact_rerank_device(
            q_flat.astype(jnp.float32), table_f32, cd, cids, metric,
            min(k_out, kc))
    else:
        d_out, i_out = cd, cids
    if pack_out:
        return jnp.concatenate(
            [jax.lax.bitcast_convert_type(d_out, jnp.int32), i_out],
            axis=-1)
    return d_out, i_out


def flat_distances(queries: jnp.ndarray, table: jnp.ndarray,
                   norms: Optional[jnp.ndarray],
                   metric: MetricType) -> jnp.ndarray:
    """Unfused [B, N] distance matrix (small N / testing)."""
    return _scores(queries.astype(table.dtype), table, norms, int(metric))


def exact_rerank(queries_f32: np.ndarray,
                 table_f32: np.ndarray,
                 ids: np.ndarray,
                 metric: MetricType) -> np.ndarray:
    """Host-side exact f32 re-scoring of candidate ids.

    When the device table is bf16 (MXU speed mode), the candidate list is
    generated with a small slack and re-scored here in f32 against the host
    source-of-truth copy, so reported @distance values and final ranking are
    exact. ids may contain -1 (padded slots) -> distance +inf.
    """
    b, kk = ids.shape
    safe = np.clip(ids, 0, table_f32.shape[0] - 1)
    cand = table_f32[safe.reshape(-1)].reshape(b, kk, -1)
    q = queries_f32[:, None, :]
    if metric == MetricType.EUCLIDEAN:
        diff = cand - q
        d = np.einsum("bkd,bkd->bk", diff, diff, dtype=np.float32)
    else:
        # einsum broadcasts the [B, 1, D] query view — no [B, k, D]
        # materialized copy.
        ip = np.einsum("bkd,bod->bk", cand, q, dtype=np.float32)
        d = 1.0 - ip if metric == MetricType.COSINE else -ip
    d = np.where(ids < 0, np.inf, d)
    return d
