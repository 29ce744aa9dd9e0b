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
from typing import Dict, List, Sequence, Tuple

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


def batch_distances(query: SparseVector,
                    column: Sequence[SparseVector],
                    row_ids: np.ndarray,
                    metric: MetricType) -> np.ndarray:
    """Score a query against a set of stored sparse vectors (by row id).

    Vectorized via a dense scatter of the query into a lookup array sized to
    the query's max index — each row then scores with one gather+dot instead
    of a python merge loop.
    """
    out = np.empty(len(row_ids), dtype=np.float32)
    if len(query.indices) == 0:
        qmax = 0
        qdense = np.zeros(1, dtype=np.float32)
    else:
        qmax = int(query.indices[-1]) + 1
        qdense = np.zeros(qmax + 1, dtype=np.float32)
        qdense[query.indices] = query.values
    qnorm = query.norm_sq()
    for i, rid in enumerate(row_ids):
        v = column[rid]
        if v is None or len(v.indices) == 0:
            ip = 0.0
            vnorm = 0.0
        else:
            inb = v.indices < qmax
            ip = float(np.dot(qdense[v.indices[inb]], v.values[inb]))
            vnorm = v.norm_sq()
        if metric == MetricType.EUCLIDEAN:
            out[i] = qnorm + vnorm - 2.0 * ip
        elif metric == MetricType.COSINE:
            out[i] = 1.0 - ip
        else:
            out[i] = -ip
    return out
