"""Grouped throughput dispatch + on-device exact re-rank.

The grouped path (Table.grouped_dense_search -> ops/beam.beam_search_grouped)
must return exactly what the per-batch pipeline returns: oracle-exact top-k
on graph tables, correct handling of deletes/filters, full-k guarantee under
selective filters, and clean fallbacks (tail rows, sharded plane, tiny
tables).
"""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.config import global_config


@pytest.fixture(autouse=True)
def _grouping_on():
    old = (global_config.query_group_size, global_config.device_rerank)
    global_config.query_group_size = 4
    global_config.device_rerank = "auto"
    yield
    global_config.query_group_size, global_config.device_rerank = old


def _mk(tmp_path, n=4000, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("gdb", str(tmp_path / "gdb"))
    vdb.use_db("gdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Tag", "dataType": "INT", "primaryKey": False},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert_columns("t", {"ID": np.arange(n), "Tag": np.arange(n) % 7,
                             "V": x}, n)
    assert vdb.rebuild() == 0
    return x, vdb._db.databases["gdb"].tables["t"]


def _oracle(x, q, k, mask=None):
    d = ((x - q) ** 2).sum(1)
    if mask is not None:
        d = np.where(mask, d, np.inf)
    return np.argsort(d, kind="stable")[:k]


def test_grouped_matches_oracle_and_exact_distances(tmp_path):
    x, table = _mk(tmp_path)
    rng = np.random.default_rng(1)
    queries = x[rng.integers(0, len(x), 600)] + 0.01 * rng.normal(
        size=(600, 32)).astype(np.float32)
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10,
                                        batch=128, mask_cacheable=True)
    assert ids.shape == (600, 10)
    hits = 0
    for i, q in enumerate(queries):
        want = _oracle(x, q, 10)
        hits += len(set(ids[i].tolist()) & set(want.tolist()))
        # Distances must be EXACT f32 (device re-rank), not bf16-approx.
        dd = ((x[ids[i]] - q) ** 2).sum(1)
        np.testing.assert_allclose(d[i], dd, rtol=1e-5)
        assert np.all(np.diff(d[i]) >= -1e-6)  # ascending
    assert hits / 6000 >= 0.99


def test_grouped_matches_pipelined_path(tmp_path):
    x, table = _mk(tmp_path, n=3000, seed=2)
    rng = np.random.default_rng(3)
    queries = x[rng.integers(0, len(x), 300)]
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    g_ids, g_d = table.grouped_dense_search("V", queries, valid,
                                            MetricType.EUCLIDEAN, 5,
                                            batch=64)
    p_ids, p_d = table._pipelined_batches("V", queries, valid,
                                          MetricType.EUCLIDEAN, 5, 64,
                                          False, None, None)
    assert (g_ids == p_ids[:, :g_ids.shape[1]]).mean() >= 0.999
    np.testing.assert_allclose(g_d, p_d[:, :g_d.shape[1]], rtol=1e-5)


def test_grouped_host_rerank_fallback(tmp_path):
    """device_rerank=off must produce the same results via host re-rank."""
    x, table = _mk(tmp_path, n=3000, seed=4)
    global_config.device_rerank = "off"
    rng = np.random.default_rng(5)
    queries = x[rng.integers(0, len(x), 200)]
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10, batch=64)
    hits = sum(len(set(ids[i, :10].tolist())
                   & set(_oracle(x, q, 10).tolist()))
               for i, q in enumerate(queries))
    assert hits / 2000 >= 0.99


def test_grouped_respects_deletes_and_filters(tmp_path):
    x, table = _mk(tmp_path, n=3000, seed=6)
    vdb.delete_by_pk("t", list(range(0, 3000, 3)))
    from vectordb_tpu.schema import MetricType
    valid = table.segment.valid_mask()
    rng = np.random.default_rng(7)
    queries = x[rng.integers(0, len(x), 150)]
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10,
                                        batch=64, mask_cacheable=True)
    assert ids.max() < 3000
    assert not np.isin(ids[ids >= 0], np.arange(0, 3000, 3)).any()
    # Selective filter via the engine-level query path (device filter +
    # grouped kernel must agree with the oracle under the mask).
    code, res = vdb.query("t", "V", x[10].tolist(), ["ID"], 5,
                          "Tag = 4", True)
    got = [r["ID"] for r in res]
    mask = (np.arange(3000) % 7 == 4) & valid[:3000]
    # Graph search under a selective filter is approximate (reference
    # post-filter semantics); require full k, filter satisfaction, and
    # high overlap with the oracle.
    assert len(got) == 5 and all(g % 7 == 4 and mask[g] for g in got)
    assert got[0] == _oracle(x, x[10], 1, mask)[0]
    assert len(set(got) & set(_oracle(x, x[10], 6, mask).tolist())) >= 4


def test_grouped_falls_back_on_tail(tmp_path):
    """Rows inserted after the build force the pipelined path (which
    merges the flat tail) — the new row must still be found."""
    x, table = _mk(tmp_path, n=2000, seed=8)
    nv = (x[:1] + 9.0).astype(np.float32)
    vdb.insert_columns("t", {"ID": np.asarray([99999]),
                             "Tag": np.asarray([1]), "V": nv}, 1)
    from vectordb_tpu.schema import MetricType
    valid = table.segment.valid_mask()
    queries = np.repeat(nv, 130, axis=0)
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 3, batch=64)
    assert (ids[:, 0] == 2000).all()  # row index of the tail insert


def test_partial_group_padding(tmp_path):
    """Q not divisible by batch*G: the padded remainder must not leak
    into results."""
    x, table = _mk(tmp_path, n=3000, seed=9)
    from vectordb_tpu.schema import MetricType
    valid = table.segment.valid_mask()
    queries = x[:333]
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 1, batch=64)
    assert ids.shape[0] == 333
    assert (ids[:, 0] == np.arange(333)).mean() >= 0.995


def test_packed_wire_dtype_is_int32():
    """The grouped result pack must keep INT32 as the wire dtype: ids
    bitcast to f32 are denormals (row ids < 2^23 have a zero exponent)
    and the TPU/relay path flushes them to zero — measured on the real
    chip: every id arrived as 0 while CPU tests passed (no FTZ on CPU).
    Distances ride as bitcast int32 bits instead, which survive."""
    import jax.numpy as jnp

    from vectordb_tpu.ops import beam as beam_ops
    from vectordb_tpu.schema import MetricType

    rng = np.random.default_rng(0)
    n, dim, b, g = 512, 16, 32, 2
    dp = 128
    tab = jnp.asarray(
        np.pad(rng.normal(size=(n, dim)).astype(np.float32),
               ((0, 0), (0, dp - dim))), dtype=jnp.bfloat16)
    nrm = jnp.asarray((np.asarray(tab, np.float32) ** 2).sum(1))
    adj = jnp.asarray(rng.integers(0, n, size=(n, 8), dtype=np.int32))
    reps = jnp.asarray(np.arange(16, dtype=np.int32))
    ok = jnp.asarray(np.ones(n, bool))
    q = jnp.asarray(rng.normal(size=(g, b, dp)).astype(np.float32))
    packed = beam_ops.beam_search_grouped(
        q, tab, nrm, adj, reps, ok, None, int(MetricType.EUCLIDEAN),
        16, 4, 4, 8, 0, 10, 10, 0, pack_out=True)
    assert packed.dtype == jnp.int32
    host = np.asarray(packed).reshape(-1, packed.shape[-1])
    d = host[:, :10].view(np.float32)
    ids = host[:, 10:]
    assert np.isfinite(d).any()
    assert (ids[np.isfinite(d[:, 0]), 0] >= 0).all()

def test_dispatch_ahead_depths_equivalent(tmp_path):
    """DispatchAhead only changes the drain schedule, never results."""
    x, table = _mk(tmp_path, n=3000, seed=5)
    rng = np.random.default_rng(6)
    queries = x[rng.integers(0, len(x), 520)]
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    old = global_config.dispatch_ahead
    try:
        global_config.query_group_size = 2
        outs = []
        for depth in (1, 2, 4):
            global_config.dispatch_ahead = depth
            outs.append(table.grouped_dense_search(
                "V", queries, valid, MetricType.EUCLIDEAN, 5, batch=64,
                mask_cacheable=True))
        for ids, d in outs[1:]:
            np.testing.assert_array_equal(ids, outs[0][0])
            np.testing.assert_allclose(d, outs[0][1], rtol=0, atol=0)
    finally:
        global_config.dispatch_ahead = old


def test_upload_threads_equivalent(tmp_path):
    """UploadThreads only changes WHICH thread issues the h2d puts (so
    their relay handshakes pipeline); padding, dispatch order, and
    results are bit-identical to the inline path."""
    x, table = _mk(tmp_path, n=3000, seed=7)
    rng = np.random.default_rng(8)
    queries = x[rng.integers(0, len(x), 520)]
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    old = global_config.upload_threads
    try:
        global_config.query_group_size = 2
        outs = []
        for n_up in (0, 2, 4):
            global_config.upload_threads = n_up
            outs.append(table.grouped_dense_search(
                "V", queries, valid, MetricType.EUCLIDEAN, 5, batch=64,
                mask_cacheable=True))
        for ids, d in outs[1:]:
            np.testing.assert_array_equal(ids, outs[0][0])
            np.testing.assert_allclose(d, outs[0][1], rtol=0, atol=0)
    finally:
        global_config.upload_threads = old


def test_drain_threads_equivalent(tmp_path):
    """DrainThreads only changes WHICH thread fetches + unpacks each
    super-chunk's packed result (drains write disjoint output slices);
    results are bit-identical to the inline drain path."""
    x, table = _mk(tmp_path, n=3000, seed=9)
    rng = np.random.default_rng(10)
    queries = x[rng.integers(0, len(x), 520)]
    valid = table.segment.valid_mask()
    from vectordb_tpu.schema import MetricType
    old = global_config.drain_threads
    try:
        global_config.query_group_size = 2
        outs = []
        for n_dr in (0, 2, 4):
            global_config.drain_threads = n_dr
            outs.append(table.grouped_dense_search(
                "V", queries, valid, MetricType.EUCLIDEAN, 5, batch=64,
                mask_cacheable=True))
        for ids, d in outs[1:]:
            np.testing.assert_array_equal(ids, outs[0][0])
            np.testing.assert_allclose(d, outs[0][1], rtol=0, atol=0)
    finally:
        global_config.drain_threads = old
