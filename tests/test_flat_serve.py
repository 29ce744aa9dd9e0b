"""Flat-serve path: adaptive whole-table scan instead of graph traversal.

On the MXU a fused scan of a <=FlatServeMaxRows bf16 table is cheaper than
a tuned beam traversal (the reference's 512-row brute-force cutover moved
up ~3 orders of magnitude, vec_search_executor.hpp:28), with near-exact
recall and no tuning. These tests pin: routing (engages at/below the row
gate, never above it, off-switch honored), oracle-exact results with exact
f32 distances, delete/filter correctness including the full-k guarantee,
host-rerank fallback, and padding hygiene. CPU tests exercise the XLA
branch of ops/flat.flat_serve_grouped; the Pallas branch shares everything
but the survivor scan (ops/pallas_topk, chip-validated by the bench).
"""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.config import global_config
from vectordb_tpu.schema import MetricType


@pytest.fixture(autouse=True)
def _flat_serve_on():
    old = (global_config.query_group_size, global_config.device_rerank,
           global_config.flat_serve, global_config.flat_serve_max_rows)
    global_config.query_group_size = 4
    global_config.device_rerank = "auto"
    global_config.flat_serve = "auto"
    yield
    (global_config.query_group_size, global_config.device_rerank,
     global_config.flat_serve, global_config.flat_serve_max_rows) = old


def _mk(tmp_path, n=4000, dim=32, seed=0, metric="EUCLIDEAN"):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("fsdb", str(tmp_path / "fsdb"))
    vdb.use_db("fsdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Tag", "dataType": "INT", "primaryKey": False},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": metric}])
    vdb.insert_columns("t", {"ID": np.arange(n), "Tag": np.arange(n) % 7,
                             "V": x}, n)
    assert vdb.rebuild() == 0
    return x, vdb._db.databases["fsdb"].tables["t"]


def _oracle(x, q, k, mask=None):
    d = ((x - q) ** 2).sum(1)
    if mask is not None:
        d = np.where(mask, d, np.inf)
    return np.argsort(d, kind="stable")[:k]


def _count_routes(monkeypatch):
    """Count flat-serve vs grouped-beam device launches."""
    from vectordb_tpu.ops import beam as beam_ops
    from vectordb_tpu.ops import flat as flat_ops
    calls = {"flat": 0, "beam": 0}
    orig_f, orig_b = flat_ops.flat_serve_grouped, beam_ops.beam_search_grouped

    def f(*a, **kw):
        calls["flat"] += 1
        return orig_f(*a, **kw)

    def b(*a, **kw):
        calls["beam"] += 1
        return orig_b(*a, **kw)

    monkeypatch.setattr(flat_ops, "flat_serve_grouped", f)
    monkeypatch.setattr("vectordb_tpu.table.flat_ops.flat_serve_grouped", f,
                        raising=False)
    monkeypatch.setattr(beam_ops, "beam_search_grouped", b)
    return calls


def test_flat_serve_routes_and_matches_oracle(tmp_path, monkeypatch):
    """At n <= FlatServeMaxRows the grouped path must take the flat-serve
    program EVEN THOUGH a graph exists, and return oracle-exact top-k with
    exact f32 distances."""
    calls = _count_routes(monkeypatch)
    x, table = _mk(tmp_path)
    assert table.graphs.get("V") is not None  # graph exists; flat wins
    rng = np.random.default_rng(1)
    queries = (x[rng.integers(0, len(x), 600)]
               + 0.01 * rng.normal(size=(600, 32)).astype(np.float32))
    valid = table.segment.valid_mask()
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10,
                                        batch=128, mask_cacheable=True)
    assert calls["flat"] > 0 and calls["beam"] == 0
    assert ids.shape == (600, 10)
    for i, q in enumerate(queries):
        np.testing.assert_array_equal(
            np.sort(ids[i]), np.sort(_oracle(x, q, 10)))
        dd = ((x[ids[i]] - q) ** 2).sum(1)
        np.testing.assert_allclose(d[i], dd, rtol=1e-5)
        assert np.all(np.diff(d[i]) >= -1e-6)


def test_flat_serve_row_gate_and_off_switch(tmp_path, monkeypatch):
    calls = _count_routes(monkeypatch)
    x, table = _mk(tmp_path, n=3000, seed=2)
    rng = np.random.default_rng(3)
    queries = x[rng.integers(0, len(x), 300)]
    valid = table.segment.valid_mask()
    # Above the row gate: the graph path must serve.
    global_config.flat_serve_max_rows = 1000
    table.grouped_dense_search("V", queries, valid, MetricType.EUCLIDEAN,
                               5, batch=128)
    assert calls["flat"] == 0 and calls["beam"] > 0
    # "on" ignores the row gate (structural gates still apply).
    global_config.flat_serve = "on"
    table.grouped_dense_search("V", queries, valid, MetricType.EUCLIDEAN,
                               5, batch=128)
    assert calls["flat"] > 0
    # "off" never flat-serves.
    calls["flat"] = calls["beam"] = 0
    global_config.flat_serve = "off"
    global_config.flat_serve_max_rows = 262144
    table.grouped_dense_search("V", queries, valid, MetricType.EUCLIDEAN,
                               5, batch=128)
    assert calls["flat"] == 0 and calls["beam"] > 0


def test_flat_serve_respects_deletes_and_filters(tmp_path):
    x, table = _mk(tmp_path, n=3000, seed=6)
    vdb.delete_by_pk("t", list(range(0, 3000, 3)))
    valid = table.segment.valid_mask()
    rng = np.random.default_rng(7)
    queries = x[rng.integers(0, len(x), 300)]
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10,
                                        batch=128, mask_cacheable=True)
    assert not np.isin(ids[ids >= 0], np.arange(0, 3000, 3)).any()
    mask = valid[:3000]
    for i, q in enumerate(queries[:50]):
        np.testing.assert_array_equal(
            np.sort(ids[i]), np.sort(_oracle(x, q, 10, mask)))
    # Device-compiled filter through the grouped flat-serve path: flat is
    # EXACT under any selectivity (no beam boost / rerouting needed).
    comp = table._compile_filter("Tag = 4")
    fctx = table._device_filter(comp.nodes, comp)
    assert fctx is not None
    f_ids, _ = table.grouped_dense_search("V", queries, valid,
                                          MetricType.EUCLIDEAN, 10,
                                          batch=128, mask_cacheable=True,
                                          filter_ctx=fctx)
    fmask = mask & (np.arange(3000) % 7 == 4)
    for i, q in enumerate(queries[:50]):
        got = f_ids[i][f_ids[i] >= 0]
        assert (got % 7 == 4).all()
        np.testing.assert_array_equal(
            np.sort(got), np.sort(_oracle(x, q, len(got), fmask)))


def test_flat_serve_full_k_with_tiny_filter(tmp_path):
    """A filter keeping fewer than k rows returns exactly those rows and
    -1 padding — never invents ids."""
    x, table = _mk(tmp_path, n=3000, seed=8)
    code, res = vdb.query("t", "V", x[10].tolist(), ["ID"], 10,
                          "ID < 4", True)
    assert code == 0
    got = sorted(r["ID"] for r in res)
    assert got == [0, 1, 2, 3]


def test_flat_serve_host_rerank_fallback(tmp_path, monkeypatch):
    """DeviceRerank=off: candidates come back for the host exact re-rank;
    results stay oracle-exact."""
    calls = _count_routes(monkeypatch)
    x, table = _mk(tmp_path, n=3000, seed=4)
    global_config.device_rerank = "off"
    rng = np.random.default_rng(5)
    queries = x[rng.integers(0, len(x), 200)]
    valid = table.segment.valid_mask()
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10, batch=128)
    assert calls["flat"] > 0
    for i, q in enumerate(queries[:50]):
        np.testing.assert_array_equal(
            np.sort(ids[i, :10]), np.sort(_oracle(x, q, 10)))


def test_flat_serve_partial_padding(tmp_path):
    x, table = _mk(tmp_path, n=3000, seed=9)
    valid = table.segment.valid_mask()
    queries = x[:333]
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 1, batch=128)
    assert ids.shape[0] == 333
    np.testing.assert_array_equal(ids[:, 0], np.arange(333))


def test_flat_serve_sees_fresh_inserts(tmp_path):
    """Flat-serve scans the whole device view — rows inserted after the
    graph build are served without any tail merge."""
    x, table = _mk(tmp_path, n=2000, seed=8)
    nv = (x[:1] + 9.0).astype(np.float32)
    vdb.insert_columns("t", {"ID": np.asarray([99999]),
                             "Tag": np.asarray([1]), "V": nv}, 1)
    valid = table.segment.valid_mask()
    queries = np.repeat(nv, 260, axis=0)
    ids, _ = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 3, batch=128)
    assert (ids[:, 0] == 2000).all()


def test_flat_serve_cosine_exact(tmp_path):
    x, table = _mk(tmp_path, n=2500, seed=11, metric="COSINE")
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(12)
    queries = xn[rng.integers(0, len(xn), 300)]
    valid = table.segment.valid_mask()
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.COSINE, 10, batch=128)
    for i in range(0, 300, 10):
        q = queries[i]
        cd = 1.0 - xn @ q
        want = np.argsort(cd, kind="stable")[:10]
        np.testing.assert_array_equal(np.sort(ids[i]), np.sort(want))
        np.testing.assert_allclose(d[i], np.sort(cd)[:10], atol=1e-5)
