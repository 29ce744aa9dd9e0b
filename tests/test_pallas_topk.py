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
