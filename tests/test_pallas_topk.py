"""Pallas fused distance + partial-min kernel (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectordb_tpu.ops import pallas_topk
from vectordb_tpu.schema import MetricType


@pytest.fixture
def interpret_kernels(monkeypatch):
    """Force pallas interpret mode so the kernel runs on CPU."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # the module refers to pl.pallas_call at call time
    monkeypatch.setattr(pallas_topk.pl, "pallas_call", patched)


def test_partial_min_matches_oracle(interpret_kernels):
    rng = np.random.default_rng(0)
    n, d, b, k = 8192, 128, 128, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    norms = (x ** 2).sum(1).astype(np.float32)
    q = x[:b] + 0.01

    dists, ids = pallas_topk.fused_topk(
        jnp.asarray(q), jnp.asarray((q ** 2).sum(1).astype(np.float32)),
        jnp.int32(0), jnp.asarray(x), jnp.asarray(norms),
        int(MetricType.EUCLIDEAN), k, n_valid=n)
    ids = np.asarray(ids)
    # every query's own row must be its top-1 (distance ~0, never folded away)
    assert (ids[:, 0] == np.arange(b)).all()


def test_mask_excludes_rows(interpret_kernels):
    rng = np.random.default_rng(1)
    n, d, b = 8192, 128, 128
    x = rng.normal(size=(n, d)).astype(np.float32)
    norms = (x ** 2).sum(1).astype(np.float32)
    q = x[:b]
    mask = np.ones(n, np.float32)
    mask[:b] = 0.0  # exclude the exact matches

    dists, ids = pallas_topk.fused_topk(
        jnp.asarray(q), jnp.asarray((q ** 2).sum(1).astype(np.float32)),
        jnp.int32(0), jnp.asarray(x), jnp.asarray(norms),
        int(MetricType.EUCLIDEAN), 8, n_valid=n, mask=jnp.asarray(mask))
    ids = np.asarray(ids)
    assert (ids >= b).all()


def test_second_survivor_beats_pair_collision(interpret_kernels):
    """Two top-k rows co-located in ONE fold group must BOTH survive.

    With a single survivor per group the second-best of a group is
    shadowed — the small-table recall regression (0.9887 at 20k rows,
    NOTES_ROUND5). Rows r and r+128 of one table tile share a strided
    fold group (lane r mod 128 within the tile), so planting the two
    nearest neighbors exactly there exercises the second plane.
    """
    rng = np.random.default_rng(3)
    n, d = 8192, 128
    x = rng.normal(size=(n, d)).astype(np.float32) * 10.0
    q = rng.normal(size=(1, d)).astype(np.float32)
    # rows 5 and 133 (= 5 + 128, same strided group) are the two closest
    x[5] = q[0] + 0.001
    x[133] = q[0] + 0.002
    qp = np.broadcast_to(q, (128, d)).copy()
    norms = (x ** 2).sum(1).astype(np.float32)
    dists, ids = pallas_topk.fused_topk(
        jnp.asarray(qp), jnp.asarray((qp ** 2).sum(1).astype(np.float32)),
        jnp.int32(0), jnp.asarray(x), jnp.asarray(norms),
        int(MetricType.EUCLIDEAN), 4, n_valid=n)
    ids = np.asarray(ids)
    assert ids[0, 0] == 5 and ids[0, 1] == 133, ids[0]


def test_exclude_self(interpret_kernels):
    rng = np.random.default_rng(2)
    n, d, b = 8192, 128, 128
    x = rng.normal(size=(n, d)).astype(np.float32)
    norms = (x ** 2).sum(1).astype(np.float32)
    q = x[:b]
    dists, ids = pallas_topk.fused_topk(
        jnp.asarray(q), jnp.asarray((q ** 2).sum(1).astype(np.float32)),
        jnp.int32(0), jnp.asarray(x), jnp.asarray(norms),
        int(MetricType.EUCLIDEAN), 4, n_valid=n, exclude_self=True)
    ids = np.asarray(ids)
    assert not (ids[:, 0] == np.arange(b)).any()
