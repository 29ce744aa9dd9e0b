"""Flat-scan kernel correctness vs numpy oracle for all three metrics.

Distance conventions follow the reference dispatch
(/root/reference/engine/db/index/index.cpp:10-35).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vectordb_tpu.ops.flat import exact_rerank, flat_topk
from vectordb_tpu.schema import MetricType


def numpy_distances(q, table, metric):
    ip = q @ table.T
    if metric == MetricType.EUCLIDEAN:
        return ((q ** 2).sum(1)[:, None] - 2 * ip
                + (table ** 2).sum(1)[None, :])
    if metric == MetricType.COSINE:
        return 1.0 - ip
    return -ip


@pytest.mark.parametrize("metric", [MetricType.EUCLIDEAN, MetricType.COSINE,
                                    MetricType.DOT_PRODUCT])
@pytest.mark.parametrize("n", [100, 4096])
def test_flat_topk_matches_numpy(metric, n):
    rng = np.random.default_rng(0)
    d = 128
    table = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(4, d)).astype(np.float32)
    if metric == MetricType.COSINE:
        table /= np.linalg.norm(table, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    norms = (table ** 2).sum(1).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    k = 10

    dist, ids = flat_topk(jnp.asarray(q), jnp.asarray(table),
                          jnp.asarray(norms), jnp.asarray(mask), metric, k)
    dist, ids = np.asarray(dist), np.asarray(ids)

    ref = numpy_distances(q, table, metric)
    ref_ids = np.argsort(ref, axis=1, kind="stable")[:, :k]
    for b in range(q.shape[0]):
        # Compare distance sets (ties may permute ids).
        np.testing.assert_allclose(np.sort(dist[b]),
                                   np.sort(ref[b][ref_ids[b]]),
                                   rtol=1e-3, atol=1e-3)


def test_mask_excludes_rows():
    rng = np.random.default_rng(1)
    table = rng.normal(size=(256, 64)).astype(np.float32)
    q = table[:2]  # exact matches exist
    mask = np.ones(256, dtype=bool)
    mask[0] = False  # row 0 must never be returned
    norms = (table ** 2).sum(1).astype(np.float32)
    dist, ids = flat_topk(jnp.asarray(q), jnp.asarray(table),
                          jnp.asarray(norms), jnp.asarray(mask),
                          MetricType.EUCLIDEAN, 5)
    assert 0 not in np.asarray(ids)


def test_k_larger_than_table():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(8, 32)).astype(np.float32)
    q = rng.normal(size=(1, 32)).astype(np.float32)
    norms = (table ** 2).sum(1).astype(np.float32)
    dist, ids = flat_topk(jnp.asarray(q), jnp.asarray(table),
                          jnp.asarray(norms),
                          jnp.asarray(np.ones(8, bool)),
                          MetricType.EUCLIDEAN, 100)
    assert np.asarray(ids).shape[1] == 8


def test_exact_rerank_fixes_bf16_scores():
    rng = np.random.default_rng(3)
    table = rng.normal(size=(64, 32)).astype(np.float32)
    q = rng.normal(size=(2, 32)).astype(np.float32)
    ids = np.tile(np.arange(10, dtype=np.int64), (2, 1))
    d = exact_rerank(q, table, ids, MetricType.EUCLIDEAN)
    ref = numpy_distances(q, table, MetricType.EUCLIDEAN)[:, :10]
    np.testing.assert_allclose(d, ref, rtol=1e-5, atol=1e-5)
    # -1 ids become +inf
    ids[0, 0] = -1
    d = exact_rerank(q, table, ids, MetricType.COSINE)
    assert np.isinf(d[0, 0])


def test_device_ground_truth_matches_host_oracle():
    """bench.device_ground_truth (exact f32 device scan) must agree with
    the host BLAS oracle — it substitutes for it at >=2M rows."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import blocked_ground_truth, device_ground_truth

    rng = np.random.default_rng(11)
    # A large common offset inflates inner-product magnitudes without
    # changing distances — this is what exposed the TPU DEFAULT-precision
    # bf16 operand truncation at 10M (oracle overlap fell to 0.98); the
    # oracle must run at Precision.HIGHEST to survive it.
    x = (rng.normal(size=(20000, 64)) + 8.0).astype(np.float32)
    xn = (x ** 2).sum(1)
    q = x[rng.integers(0, 20000, 256)] + 0.05 * rng.normal(
        size=(256, 64)).astype(np.float32)
    host = blocked_ground_truth(x, xn, q, 10)
    dev = device_ground_truth(x, xn, q, 10, batch=256)
    overlap = np.mean([
        len(set(host[i]) & set(dev[i])) / 10 for i in range(len(q))])
    assert overlap >= 0.999, overlap
