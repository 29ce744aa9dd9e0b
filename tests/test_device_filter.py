"""Device-compiled filter masks (expr/device.py): results must match the
host FilterCompiler path exactly, and the device path must actually engage
(no per-query host mask) for numeric/bool/geo filters."""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.expr.device import is_device_compilable
from vectordb_tpu.expr.parser import parse_expr
from vectordb_tpu.schema import FieldType


FIELDS = {"ID": FieldType.INT8, "price": FieldType.DOUBLE,
          "stock": FieldType.INT4, "active": FieldType.BOOL,
          "name": FieldType.STRING, "loc": FieldType.GEO_POINT,
          "@distance": FieldType.DOUBLE}


@pytest.mark.parametrize("expr,ok", [
    ("price > 10.5", True),
    ("price * 2.0 + stock > 30.0 AND active", True),
    ("NOT (stock % 3 = 0)", True),
    ("NEARBY(loc, 37.0, -122.0, 50.0)", True),
    ("name = 'abc'", False),
    ("name LIKE 'a%'", False),
    ("@distance < 1.5", False),
])
def test_is_device_compilable(expr, ok):
    nodes = parse_expr(expr, FIELDS)
    assert is_device_compilable(nodes) == ok


def _setup(tmp_path, n=3000, dim=32):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("fdb", str(tmp_path / "fdb"))
    vdb.use_db("fdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "price", "dataType": "DOUBLE"},
        {"name": "active", "dataType": "BOOL"},
        {"name": "loc", "dataType": "GEO_POINT"},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    price = rng.uniform(0, 100, n)
    active = rng.integers(0, 2, n).astype(bool)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-179, 179, n)
    vdb.insert("t", [{"ID": i, "price": float(price[i]),
                      "active": bool(active[i]),
                      "loc": {"latitude": float(lat[i]),
                              "longitude": float(lon[i])},
                      "V": x[i].tolist()} for i in range(n)])
    return x, price, active, lat, lon


def test_device_filter_matches_oracle(tmp_path):
    x, price, active, lat, lon = _setup(tmp_path)
    q = x[100]
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10,
                          "price > 50.0 AND active")
    ids = [r["ID"] for r in res]
    table = vdb._db.databases["fdb"].tables["t"]
    assert getattr(table, "_device_filter_cache", {}), \
        "device filter did not engage"
    sel = (price > 50.0) & active
    d = ((x - q) ** 2).sum(1)
    d[~sel] = np.inf
    oracle = np.argsort(d, kind="stable")[:10].tolist()
    assert ids == oracle
    assert all(price[i] > 50.0 and active[i] for i in ids)


def test_device_filter_repeat_and_new_constants(tmp_path):
    x, price, active, lat, lon = _setup(tmp_path)
    q = x[5]
    for thr in (20.0, 80.0, 20.0):
        code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10,
                              f"price < {thr}")
        ids = [r["ID"] for r in res]
        sel = price < thr
        d = ((x - q) ** 2).sum(1)
        d[~sel] = np.inf
        oracle = np.argsort(d, kind="stable")[:10].tolist()
        assert ids == oracle, thr


def test_device_nearby_filter(tmp_path):
    x, price, active, lat, lon = _setup(tmp_path)
    q = x[9]
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10,
                          "NEARBY(loc, 10.0, 20.0, 2000.0)")
    ids = [r["ID"] for r in res]
    from vectordb_tpu.expr.evaluator import haversine_km
    sel = haversine_km(lat, lon, 10.0, 20.0) <= 2000.0
    d = ((x - q) ** 2).sum(1)
    d[~sel] = np.inf
    oracle = np.argsort(d, kind="stable")[:min(10, sel.sum())].tolist()
    assert ids == oracle


def test_string_filter_stays_on_host(tmp_path):
    x, price, active, lat, lon = _setup(tmp_path, n=500)
    q = x[3]
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 5, "ID < 100")
    table = vdb._db.databases["fdb"].tables["t"]
    n_dev = len(getattr(table, "_device_filter_cache", {}))
    assert n_dev == 1
    # @distance filters must not go through the device path.
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 5,
                          "@distance < 1000.0", True)
    assert len(getattr(table, "_device_filter_cache", {})) == n_dev
    assert [r["ID"] for r in res][0] == 3


def test_big_int_pk_falls_back(tmp_path):
    """INT8 PKs beyond 2^24 can't live in f32 device columns — the filter
    must fall back to the host mask and stay exact."""
    rng = np.random.default_rng(1)
    dim = 16
    x = rng.normal(size=(300, dim)).astype(np.float32)
    vdb.load_db("fdb2", str(tmp_path / "fdb2"))
    vdb.use_db("fdb2")
    vdb.create_table("t2", [
        {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    base = (1 << 30)
    ids_all = [base + 3 * i for i in range(300)]
    vdb.insert("t2", [{"ID": ids_all[i], "V": x[i].tolist()}
                      for i in range(300)])
    q = x[250]
    thr = base + 3 * 100
    code, res = vdb.query("t2", "V", q.tolist(), ["ID"], 5, f"ID < {thr}")
    got = [r["ID"] for r in res]
    d = ((x - q) ** 2).sum(1)
    d[np.asarray(ids_all) >= thr] = np.inf
    oracle = [ids_all[i] for i in np.argsort(d, kind="stable")[:5]]
    assert got == oracle


def test_all_masked_graph_query(tmp_path):
    """Every row filtered out: graph path + flat top-up must return empty,
    not crash or return masked rows."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1500, 16)).astype(np.float32)
    vdb.load_db("fdb3", str(tmp_path / "fdb3"))
    vdb.use_db("fdb3")
    vdb.create_table("t3", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 16,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t3", [{"ID": i, "V": x[i].tolist()} for i in range(1500)])
    vdb.rebuild()
    code, res = vdb.query("t3", "V", x[0].tolist(), ["ID"], 10, "ID < 0")
    assert res == []
    # Single-match filter still returns exactly that row.
    code, res = vdb.query("t3", "V", x[0].tolist(), ["ID"], 10, "ID = 700")
    assert [r["ID"] for r in res] == [700]


def test_selectivity_gate_routes_and_boosts(tmp_path, monkeypatch):
    """Filter selectivity drives search routing (VERDICT r3 quality fix):
    a filter keeping < alive/SELECTIVE_FLAT_RATIO rows pre-filters via the
    EXACT masked flat scan (no beam dispatch); a moderate filter stays on
    the graph with a widened beam+termination window. Exactness of the
    selective path is asserted against the numpy oracle."""
    rng = np.random.default_rng(21)
    n, dim = 2000, 16
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("fdb4", str(tmp_path / "fdb4"))
    vdb.use_db("fdb4")
    vdb.create_table("t4", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t4", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
    vdb.rebuild()

    from vectordb_tpu.ops import beam as beam_ops
    calls = []
    orig = beam_ops.beam_search_topk
    monkeypatch.setattr(
        beam_ops, "beam_search_topk",
        lambda *a, **k: (calls.append(a[7]), orig(*a, **k))[1])

    # Selective (5% of rows): flat pre-filter, exact, zero beam dispatches.
    q = x[1234]
    d = ((x - q) ** 2).sum(1)
    oracle = [int(i) for i in np.argsort(d, kind="stable")
              if i < 100][:10]
    code, res = vdb.query("t4", "V", q.tolist(), ["ID"], 10, "ID < 100")
    assert [r["ID"] for r in res] == oracle
    assert calls == [], "selective filter must skip the graph"

    # Moderate (50%): graph path with a boosted beam width.
    code, res = vdb.query("t4", "V", q.tolist(), ["ID"], 10, "ID >= 1000")
    assert len(calls) == 1
    from vectordb_tpu.config import global_config
    assert calls[0] > global_config.search_ef, \
        "moderate filter must widen the beam"
    oracle2 = [int(i) for i in np.argsort(d, kind="stable")
               if i >= 1000][:10]
    got = [r["ID"] for r in res]
    assert len(set(got) & set(oracle2)) >= 9  # boosted recall
