"""Regression tests for code-review findings."""
import json
import os

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.db_server import DBServer


def test_dump_to_different_path_is_loadable(tmp_path):
    """dump_db must write the catalog to the DUMP path (finding #1)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    vdb.load_db("d1", src)
    vdb.use_db("d1")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": 1, "V": [1.0, 2.0]}])
    assert vdb.dump_db("d1", dst) == 0
    assert os.path.exists(os.path.join(dst, "catalog"))
    vdb.unload_db("d1")
    # The dump is a complete, loadable database.
    assert vdb.load_db("d2", dst) == 0
    vdb.use_db("d2")
    _, rows = vdb.get("t", ["ID"])
    assert rows == [{"ID": 1}]


def test_dump_missing_db_returns_not_found(tmp_path):
    from vectordb_tpu.errors import DB_NOT_FOUND

    eng = DBServer()
    assert eng.dump_db("nope", str(tmp_path)).code == DB_NOT_FOUND
    eng.stop()


def test_get_limit_zero_returns_nothing(tmp_path):
    """limit=0 returns zero rows (finding #2)."""
    vdb.load_db("lz", str(tmp_path / "lz"))
    vdb.use_db("lz")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": i, "V": [float(i), 0.0]} for i in range(5)])
    _, rows = vdb.get("t", ["ID"], limit=0)
    assert rows == []


def test_bulk_insert_normalizes_cosine(tmp_path):
    """insert_columns applies COSINE ingest normalization (finding #3)."""
    vdb.load_db("cn", str(tmp_path / "cn"))
    vdb.use_db("cn")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
         "metricType": "COSINE"}])
    x = np.asarray([[10.0, 0, 0, 0], [0, 0.5, 0, 0], [3.0, 3.0, 0, 0]],
                   np.float32)
    vdb.insert_columns("t", {"ID": np.arange(3), "V": x})
    # Same DIRECTION as row 0 but different magnitude -> distance ~0.
    code, res = vdb.query("t", "V", [2.0, 0, 0, 0], ["ID"], 1, "", True)
    assert res[0]["ID"] == 0
    assert res[0]["@distance"] == pytest.approx(0.0, abs=1e-4)
    # Stored row is normalized.
    _, rows = vdb.get("t", ["V"], primary_keys=[0])
    assert rows[0]["V"][0] == pytest.approx(1.0, abs=1e-5)


def test_bulk_insert_rejects_wrong_dims(tmp_path):
    vdb.load_db("bd", str(tmp_path / "bd"))
    vdb.use_db("bd")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
         "metricType": "EUCLIDEAN"}])
    with pytest.raises(Exception, match="expects"):
        vdb.insert_columns("t", {"ID": np.arange(2),
                                 "V": np.zeros((2, 3), np.float32)})


def test_stale_graph_not_loaded(tmp_path):
    """A graph built from more rows than the local table is skipped
    (finding #5)."""
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    path = str(tmp_path / "sg")
    vdb.load_db("sg", path, vector_scale=500)
    vdb.use_db("sg")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
         "metricType": "EUCLIDEAN"}])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 8)).astype(np.float32)
    vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(400)])
    vdb.rebuild()
    vdb.dump_db("sg", path)
    table = vdb._engine().get_db("sg").get_table("t")
    graph_file = table._graph_path("V")
    assert os.path.exists(graph_file)
    vdb.unload_db("sg")

    # Fake a stale replica: a snapshot with FEWER rows than the graph.
    # Overwrite the graph metadata to claim more rows.
    import numpy as _np
    with _np.load(graph_file, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        adjacency = z["adjacency"]
    meta["num_rows"] = 10000  # ahead of the table
    import io
    buf = io.BytesIO()
    _np.savez(buf, adjacency=adjacency,
              meta=_np.frombuffer(json.dumps(meta).encode(), _np.uint8))
    open(graph_file, "wb").write(buf.getvalue())

    vdb.load_db("sg", path, vector_scale=500)
    vdb.use_db("sg")
    table = vdb._engine().get_db("sg").get_table("t")
    assert table.graphs["V"] is None  # stale graph skipped
    # Queries still work via the flat path.
    _, res = vdb.query("t", "V", x[3].tolist(), ["ID"], 1)
    assert res[0]["ID"] == 3


def test_empty_sparse_vector_survives_replay(tmp_path):
    """Empty sparse vectors are preserved across WAL replay (finding #8)."""
    name = "es"
    vdb.load_db(name, str(tmp_path / name))
    vdb.use_db(name)
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Vec", "dataType": "SPARSE_VECTOR_FLOAT",
         "dimensions": 10, "metricType": "COSINE"}])
    vdb.insert("t", [
        {"ID": 1, "Vec": {"indices": [], "values": []}},
        {"ID": 2, "Vec": {"indices": [3], "values": [1.0]}}])
    _, before = vdb.query("t", "Vec", {"indices": [3], "values": [1.0]},
                          ["ID"], 2, "", True)
    vdb.unload_db(name)   # WAL-only restart
    vdb.load_db(name, str(tmp_path / name))
    vdb.use_db(name)
    _, after = vdb.query("t", "Vec", {"indices": [3], "values": [1.0]},
                         ["ID"], 2, "", True)
    assert [r["ID"] for r in before] == [r["ID"] for r in after]
    assert len(after) == 2  # the empty-vector row is still searchable


def test_concurrent_load_same_db(tmp_path):
    """Concurrent loads of one name yield exactly one Database
    (finding #10)."""
    import threading

    eng = DBServer()
    results = []

    def loader():
        results.append(eng.load_db("race", str(tmp_path / "race")).code)

    ts = [threading.Thread(target=loader) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results.count(0) == 1  # one success, rest DB_ALREADY_EXIST
    eng.stop()


def test_corrupt_tuned_ef_sidecar_does_not_block_load(tmp_path):
    """A tuned_ef.json whose top level is not a dict must not prevent the
    table from loading (ADVICE r2: AttributeError escaped __init__)."""
    import json
    import os

    import numpy as np

    import vectordb_tpu as vdb

    d = str(tmp_path / "db")
    vdb.load_db("cfg", d)
    vdb.use_db("cfg")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
         "metricType": "EUCLIDEAN"}])
    x = np.random.default_rng(0).normal(size=(50, 8)).astype(np.float32)
    vdb.insert_columns("t", {"ID": np.arange(50), "V": x}, 50)
    vdb.dump_db("cfg", d)
    table = vdb._db.databases["cfg"].tables["t"]
    sidecar = table._tuned_ef_path()
    vdb.unload_db("cfg")
    for bad in (["not", "a", "dict"], "just a string", {"V": "NaN"}):
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        with open(sidecar, "w") as f:
            json.dump(bad, f)
        assert vdb.load_db("cfg", d) == 0, bad
        code, res = vdb.query("t", "V", x[3].tolist(), ["ID"], 5)
        assert res[0]["ID"] == 3
        vdb.unload_db("cfg")


def test_export_reference_graph_first_record_id(tmp_path):
    """save_reference_graph must write the segment's first_record_id, not
    a 0 literal, so the exported graph and data_mvp.bin agree
    (ADVICE r2)."""
    import struct

    import numpy as np

    from vectordb_tpu import compat
    from vectordb_tpu.index.graph import GraphIndex

    class _G:
        adjacency_host = np.array([[1, -1], [0, -1]], dtype=np.int32)
        num_rows = 2
        nav_point = 0

    path = str(tmp_path / "g.bin")
    compat.save_reference_graph(path, _G(), first_record_id=42)
    with open(path, "rb") as f:
        n, first = struct.unpack("<Qq", f.read(16))
    assert (n, first) == (2, 42)


def test_concurrent_rebuilds_build_once(tmp_path):
    """The 60s background rebuild thread and an explicit POST /api/rebuild
    must not run the same compile-heavy graph build twice concurrently
    (measured: two racing 200k builds pushed one device past 600 s).
    Table._rebuild_lock serializes callers; the loser skips via built==n."""
    import threading
    from vectordb_tpu.index.graph import GraphIndex

    n, dim = 300, 16
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("rrdb", str(tmp_path / "rrdb"), vector_scale=n)
    vdb.use_db("rrdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])

    table = vdb._engine().get_db("rrdb").get_table("t")
    calls = []
    real_build = GraphIndex.__dict__["build"]
    orig = real_build.__func__

    def counting_build(cls, *args, **kwargs):
        calls.append(threading.get_ident())
        return orig(cls, *args, **kwargs)

    GraphIndex.build = classmethod(counting_build)
    try:
        threads = [threading.Thread(target=table.rebuild) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        GraphIndex.build = real_build
    assert len(calls) == 1, f"graph built {len(calls)} times"
    assert table.graphs["V"] is not None and table.graphs["V"].num_rows == n
