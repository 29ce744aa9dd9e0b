"""Sparse vector representation and distance math.

Mirrors the reference's sorted-coordinate sparse vectors and merge-join
distance functions (/root/reference/engine/db/vector.{hpp,cpp}): a sparse
vector is a pair of parallel arrays (indices ascending, values), and
EUCLIDEAN / COSINE / DOT_PRODUCT distances follow the same conventions as
dense (squared L2; 1 - ip with ingest-time normalization; -ip).

Host-side numpy is used for individual query scoring (sparse workloads are a
small fraction and bandwidth-light); batched hybrid fusion re-ranking can
promote candidate sets to dense blocks on device.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..schema import MetricType


@dataclass
class SparseVector:
    indices: np.ndarray  # int64, strictly ascending
    values: np.ndarray   # float32

    @staticmethod
    def from_json(obj: Dict) -> "SparseVector":
        idx = np.asarray(obj.get("indices", []), dtype=np.int64)
        val = np.asarray(obj.get("values", []), dtype=np.float32)
        return SparseVector(idx, val)

    def to_json(self) -> Dict:
        return {"indices": self.indices.tolist(),
                "values": [float(v) for v in self.values]}

    def norm_sq(self) -> float:
        return float(np.dot(self.values, self.values))

    def normalized(self) -> "SparseVector":
        s = self.norm_sq()
        if s > 1e-10:
            return SparseVector(self.indices, self.values / np.float32(np.sqrt(s)))
        return self


def inner_product(a: SparseVector, b: SparseVector) -> float:
    """Merge-join IP (reference vector.cpp:7-25)."""
    ia = np.searchsorted(a.indices, b.indices)
    ia = np.clip(ia, 0, len(a.indices) - 1) if len(a.indices) else ia
    if len(a.indices) == 0 or len(b.indices) == 0:
        return 0.0
    match = a.indices[ia] == b.indices
    return float(np.dot(a.values[ia[match]], b.values[match]))


def ip_distance(a: SparseVector, b: SparseVector) -> float:
    return -inner_product(a, b)


def cosine_distance(a: SparseVector, b: SparseVector) -> float:
    """1 - ip; assumes ingest-time normalization (reference vector.cpp:27-47
    normalizes explicitly — ingest already normalized, matching the dense
    convention used by the search path)."""
    return 1.0 - inner_product(a, b)


def l2_distance_sq(a: SparseVector, b: SparseVector) -> float:
    """||a||^2 + ||b||^2 - 2 a.b (reference vector.cpp:71-100)."""
    return a.norm_sq() + b.norm_sq() - 2.0 * inner_product(a, b)


def distance(a: SparseVector, b: SparseVector, metric: MetricType) -> float:
    if metric == MetricType.EUCLIDEAN:
        return l2_distance_sq(a, b)
    if metric == MetricType.COSINE:
        return cosine_distance(a, b)
    return ip_distance(a, b)


import functools


def _sparse_ip_kernel(idx, val, offsets, qdense):
    """Query IP against every row: gather + cumsum + boundary diff.

    Rows are stored contiguously (CSR), so the segmented reduction is an
    inclusive cumsum with gathers at the row boundaries — far faster on TPU
    than scatter-add segment_sum. f32 cumsum drift is corrected by the
    caller's exact re-rank of the top candidates.
    """
    import jax

    global _sparse_ip_jit
    if _sparse_ip_jit is None:
        import jax.numpy as jnp

        @jax.jit
        def kernel(idx, val, offsets, qdense):
            qd = jnp.concatenate([qdense, jnp.zeros((1,), jnp.float32)])
            safe = jnp.minimum(idx, qdense.shape[0])  # OOB -> appended zero
            contrib = jnp.take(qd, safe) * val
            c = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                 jnp.cumsum(contrib)])
            return jnp.take(c, offsets[1:]) - jnp.take(c, offsets[:-1])

        _sparse_ip_jit = kernel
    return _sparse_ip_jit(idx, val, offsets, qdense)


_sparse_ip_jit = None


class SparseColumnIndex:
    """CSR snapshot of a sparse column for vectorized batch scoring.

    Concatenates all stored vectors into (indices, values, row offsets) so a
    query scores EVERY row with one gather + one segmented reduction —
    replacing the per-row merge loop of the reference's sparse path
    (vector.cpp:7-25) with whole-column numpy ops.
    """

    def __init__(self, column: Sequence[Optional[SparseVector]], n_rows: int):
        idx_parts, val_parts, offsets = [], [], [0]
        for r in range(n_rows):
            v = column[r]
            if v is not None and len(v.indices):
                idx_parts.append(v.indices)
                val_parts.append(v.values)
                offsets.append(offsets[-1] + len(v.indices))
            else:
                offsets.append(offsets[-1])
        self.indices = (np.concatenate(idx_parts) if idx_parts
                        else np.zeros(0, np.int64))
        self.values = (np.concatenate(val_parts) if val_parts
                       else np.zeros(0, np.float32))
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.n_rows = n_rows
        # Row id of every stored nnz (for one-pass bincount reductions).
        counts = np.diff(self.offsets)
        self.rows_of_nnz = np.repeat(
            np.arange(n_rows, dtype=np.int64), counts)
        self.norms_sq = np.bincount(
            self.rows_of_nnz, weights=self.values.astype(np.float64) ** 2,
            minlength=n_rows).astype(np.float32)

    # Device scoring: the CSR arrays upload once (padded to buckets so the
    # kernel compiles a bounded number of shapes); each query uploads only
    # its dense scatter and runs gather + segment-sum on the TPU.

    def _device_arrays(self):
        if getattr(self, "_dev", None) is None:
            import jax.numpy as jnp

            def bucket(x):
                b = 4096
                while b < x:
                    b *= 2
                return b

            nnz_pad = bucket(max(len(self.indices), 1))
            rows_pad = bucket(max(self.n_rows, 1))
            idx = np.zeros(nnz_pad, np.int32)
            idx[:len(self.indices)] = self.indices
            val = np.zeros(nnz_pad, np.float32)
            val[:len(self.values)] = self.values
            offs = np.full(rows_pad + 1, len(self.indices), np.int32)
            offs[:len(self.offsets)] = self.offsets
            self._dev = (jnp.asarray(idx), jnp.asarray(val),
                         jnp.asarray(offs), rows_pad)
        return self._dev

    def scores(self, query: SparseVector, metric: MetricType) -> np.ndarray:
        """Distances of the query to every row, [n_rows] f32 (TPU gather +
        segment-sum; numpy fallback for empty queries)."""
        if len(query.indices):
            import jax.numpy as jnp

            idx, val, offs, rows_pad = self._device_arrays()
            # Pad the query scatter to a power-of-2 bucket so the kernel
            # compiles a bounded number of shapes across queries.
            qmax = int(query.indices[-1]) + 1
            qpad = 1024
            while qpad < qmax:
                qpad *= 2
            qdense = np.zeros(qpad, dtype=np.float32)
            qdense[query.indices] = query.values
            ip_dev = _sparse_ip_kernel(idx, val, offs, jnp.asarray(qdense))
            ip = np.asarray(ip_dev)[: self.n_rows]
        else:
            ip = np.zeros(self.n_rows, dtype=np.float32)
        if metric == MetricType.EUCLIDEAN:
            return query.norm_sq() + self.norms_sq - 2.0 * ip
        if metric == MetricType.COSINE:
            return 1.0 - ip
        return -ip

    def scores_host(self, query: SparseVector,
                    metric: MetricType) -> np.ndarray:
        """Pure-numpy scoring path (no device round trip)."""
        if len(query.indices):
            qmax = int(query.indices[-1]) + 1
            qdense = np.zeros(qmax + 1, dtype=np.float32)
            qdense[query.indices] = query.values
            contrib = np.where(self.indices < qmax,
                               qdense[np.minimum(self.indices, qmax)]
                               * self.values, 0.0)
            ip = np.bincount(self.rows_of_nnz, weights=contrib,
                             minlength=self.n_rows).astype(np.float32)
        else:
            ip = np.zeros(self.n_rows, dtype=np.float32)
        if metric == MetricType.EUCLIDEAN:
            return query.norm_sq() + self.norms_sq - 2.0 * ip
        if metric == MetricType.COSINE:
            return 1.0 - ip
        return -ip


def batch_distances(query: SparseVector,
                    column: Sequence[SparseVector],
                    row_ids: np.ndarray,
                    metric: MetricType,
                    index: Optional[SparseColumnIndex] = None) -> np.ndarray:
    """Score a query against stored sparse vectors at `row_ids`.

    With a SparseColumnIndex this is one vectorized pass over the CSR
    arrays; otherwise a temporary index is built from the column.
    """
    if index is None:
        n = (int(row_ids.max()) + 1) if len(row_ids) else 0
        index = SparseColumnIndex(column, n)
    return index.scores(query, metric)[row_ids]
