"""Real ANN-benchmark dataset loaders (SIFT1M / GIST1M / Deep, etc.).

The environment has zero egress, so nothing here downloads — these load
standard on-disk formats when a dataset is already present:

  - ann-benchmarks HDF5 (the format the reference's own benchmark script
    consumes, /root/reference/engine/test/bindings/python/
    gist-960-euclidean.py:12-24): datasets "train", "test", "neighbors".
  - TexMex .fvecs/.ivecs/.bvecs (irisa SIFT1M/GIST1M layout: a directory
    with <name>_base.fvecs, <name>_query.fvecs, <name>_groundtruth.ivecs).

Usage: point BENCH_DATASET / SCALE_DATASET at the .hdf5 file or the
TexMex directory; bench harnesses then score recall against the
dataset's published ground truth instead of a computed oracle.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def read_fvecs(path: str, dtype=np.float32) -> np.ndarray:
    """TexMex .fvecs: each row is [int32 dim][dim * float32]."""
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(raw[0])
    rows = raw.reshape(-1, dim + 1)
    return rows[:, 1:].view(np.float32).astype(dtype, copy=False)


def read_ivecs(path: str) -> np.ndarray:
    """TexMex .ivecs: each row is [int32 dim][dim * int32]."""
    raw = np.fromfile(path, dtype=np.int32)
    dim = int(raw[0])
    return raw.reshape(-1, dim + 1)[:, 1:]


def read_bvecs(path: str, limit: Optional[int] = None) -> np.ndarray:
    """TexMex .bvecs: each row is [int32 dim][dim * uint8] (Deep1B/SIFT1B
    style). `limit` caps rows without reading the whole file."""
    with open(path, "rb") as f:
        dim = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
    row_bytes = 4 + dim
    count = -1 if limit is None else limit * row_bytes
    raw = np.fromfile(path, dtype=np.uint8, count=count)
    rows = raw.reshape(-1, row_bytes)
    return rows[:, 4:].astype(np.float32)


def load_ann_benchmarks_hdf5(path: str):
    """ann-benchmarks .hdf5 -> (train, queries, ground_truth, distance)."""
    import h5py

    with h5py.File(path, "r") as f:
        train = np.asarray(f["train"], dtype=np.float32)
        queries = np.asarray(f["test"], dtype=np.float32)
        gt = (np.asarray(f["neighbors"], dtype=np.int64)
              if "neighbors" in f else None)
        distance = f.attrs.get("distance", "euclidean")
        if isinstance(distance, bytes):
            distance = distance.decode()
    return train, queries, gt, str(distance)


def load_texmex_dir(path: str):
    """Directory holding <name>_base.fvecs / _query.fvecs /
    _groundtruth.ivecs (SIFT1M/GIST1M archives unpack to this layout)."""
    base = query = gt_path = None
    for fn in sorted(os.listdir(path)):
        full = os.path.join(path, fn)
        if fn.endswith("_base.fvecs"):
            base = full
        elif fn.endswith("_query.fvecs"):
            query = full
        elif fn.endswith("_groundtruth.ivecs"):
            gt_path = full
    if base is None or query is None:
        raise FileNotFoundError(
            f"{path}: expected <name>_base.fvecs and <name>_query.fvecs")
    train = read_fvecs(base)
    queries = read_fvecs(query)
    gt = read_ivecs(gt_path).astype(np.int64) if gt_path else None
    return train, queries, gt, "euclidean"


def load_dataset(path: str) -> Tuple[np.ndarray, np.ndarray,
                                     Optional[np.ndarray], str]:
    """Dispatch on path: .hdf5 file -> ann-benchmarks; directory ->
    TexMex. Returns (train [N,D] f32, queries [Q,D] f32,
    ground_truth [Q,>=k] int64 or None, distance_name)."""
    if os.path.isdir(path):
        return load_texmex_dir(path)
    if path.endswith((".hdf5", ".h5")):
        return load_ann_benchmarks_hdf5(path)
    raise ValueError(f"unrecognized dataset path: {path}")
