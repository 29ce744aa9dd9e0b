"""Loaders for on-disk ANN benchmark formats (benchmarks/datasets.py):
TexMex fvecs/ivecs/bvecs and ann-benchmarks HDF5 — the formats SIFT1M /
GIST1M / Deep ship in (the reference's own benchmark consumes the hdf5
form, engine/test/bindings/python/gist-960-euclidean.py:12-24)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks"))
from datasets import (load_dataset, read_bvecs, read_fvecs,  # noqa: E402
                      read_ivecs)


def write_fvecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.float32).view(np.int32)
    out.tofile(path)


def write_ivecs(path, arr):
    n, d = arr.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = arr.astype(np.int32)
    out.tofile(path)


class TestTexMex:
    def test_fvecs_round_trip(self, tmp_path):
        x = np.random.default_rng(0).normal(size=(20, 16)).astype(np.float32)
        p = str(tmp_path / "a.fvecs")
        write_fvecs(p, x)
        np.testing.assert_array_equal(read_fvecs(p), x)

    def test_ivecs_round_trip(self, tmp_path):
        g = np.arange(60, dtype=np.int32).reshape(6, 10)
        p = str(tmp_path / "a.ivecs")
        write_ivecs(p, g)
        np.testing.assert_array_equal(read_ivecs(p), g)

    def test_bvecs_with_limit(self, tmp_path):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 256, size=(30, 8)).astype(np.uint8)
        p = str(tmp_path / "a.bvecs")
        with open(p, "wb") as f:
            for row in x:
                f.write(np.int32(8).tobytes())
                f.write(row.tobytes())
        got = read_bvecs(p)
        np.testing.assert_array_equal(got, x.astype(np.float32))
        np.testing.assert_array_equal(read_bvecs(p, limit=5),
                                      x[:5].astype(np.float32))

    def test_texmex_dir_dispatch(self, tmp_path):
        rng = np.random.default_rng(2)
        base = rng.normal(size=(50, 8)).astype(np.float32)
        q = rng.normal(size=(5, 8)).astype(np.float32)
        gt = np.argsort(((base[None] - q[:, None]) ** 2).sum(-1),
                        axis=1)[:, :10]
        write_fvecs(str(tmp_path / "sift_base.fvecs"), base)
        write_fvecs(str(tmp_path / "sift_query.fvecs"), q)
        write_ivecs(str(tmp_path / "sift_groundtruth.ivecs"), gt)
        train, queries, g, dist = load_dataset(str(tmp_path))
        np.testing.assert_array_equal(train, base)
        np.testing.assert_array_equal(queries, q)
        np.testing.assert_array_equal(g, gt)
        assert dist == "euclidean"

    def test_missing_base_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_dataset(str(tmp_path))


class TestHdf5:
    def test_ann_benchmarks_layout(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        rng = np.random.default_rng(3)
        train = rng.normal(size=(40, 4)).astype(np.float32)
        test = rng.normal(size=(6, 4)).astype(np.float32)
        nbrs = np.argsort(((train[None] - test[:, None]) ** 2).sum(-1),
                          axis=1)[:, :10]
        p = str(tmp_path / "d.hdf5")
        with h5py.File(p, "w") as f:
            f.create_dataset("train", data=train)
            f.create_dataset("test", data=test)
            f.create_dataset("neighbors", data=nbrs)
            f.attrs["distance"] = "euclidean"
        tr, te, g, dist = load_dataset(p)
        np.testing.assert_array_equal(tr, train)
        np.testing.assert_array_equal(te, test)
        np.testing.assert_array_equal(g, nbrs)
        assert dist == "euclidean"
