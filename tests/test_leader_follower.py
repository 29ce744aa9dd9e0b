"""Leader/follower semantics + concurrent insert/query during rebuild.

Mirrors the reference's leader-only write guards (basic_meta_impl.cpp:
199-202, table_mvp.cpp:103-170, write_ahead_log.hpp:72-75) and its
InsertAndQueryDenseVectorDuringRebuild concurrency tests (db_server.cpp).
"""
import os
import threading

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.db_server import DBServer

SCHEMA = {
    "name": "t",
    "fields": [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
         "metricType": "EUCLIDEAN"},
    ],
}


def records(lo, hi, rng):
    return [{"ID": i, "V": rng.normal(size=8).astype(float).tolist()}
            for i in range(lo, hi)]


class TestLeaderFollower:
    def test_follower_never_writes(self, tmp_path):
        eng = DBServer()
        eng.set_leader(False)
        path = str(tmp_path / "fdb")
        assert eng.load_db("fdb", path).ok()
        st, _ = eng.create_table("fdb", SCHEMA)
        assert st.ok()
        rng = np.random.default_rng(0)
        eng.insert("fdb", "t", records(0, 50, rng))
        eng.rebuild()
        eng.dump_db("fdb", path)
        # Follower wrote NOTHING: no catalog, no wal files, no snapshot.
        assert not os.path.exists(os.path.join(path, "catalog"))
        wal_dir = os.path.join(path, "0", "wal")
        if os.path.isdir(wal_dir):
            data_files = [f for f in os.listdir(wal_dir)
                          if f.endswith((".log", ".blog"))]
            assert data_files == [] or all(
                os.path.getsize(os.path.join(wal_dir, f)) <= 8
                for f in data_files)
        assert not os.path.exists(os.path.join(path, "0", "data.vdb"))

    def test_follower_reloads_leader_state(self, tmp_path):
        path = str(tmp_path / "shared")
        rng = np.random.default_rng(1)
        # Leader writes.
        leader = DBServer()
        leader.load_db("db", path)
        leader.create_table("db", SCHEMA)
        leader.insert("db", "t", records(0, 200, rng))
        leader.dump_db("db", path)
        leader.stop()
        # Follower loads the shared storage read-only.
        follower = DBServer()
        follower.set_leader(False)
        assert follower.load_db("db", path).ok()
        st, rows, _ = follower.project("db", "t", ["ID"], [], "", 0, -1)
        assert len(rows) == 200
        follower.stop()

    def test_follower_reloads_graph_built_by_leader(self, tmp_path):
        path = str(tmp_path / "gshared")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(300, 8)).astype(np.float32)
        leader = DBServer()
        leader.load_db("db", path)
        leader.create_table("db", SCHEMA)
        leader.insert("db", "t",
                      [{"ID": i, "V": x[i].tolist()} for i in range(300)])
        leader.rebuild()  # builds + saves graph (n >= MinimalGraphSize)
        leader.dump_db("db", path)
        graph_file = os.path.join(path, "0", "ann_graph_1.npz")
        assert os.path.exists(graph_file)
        leader.stop()

        follower = DBServer()
        follower.set_leader(False)
        follower.load_db("db", path)
        table = follower.get_db("db").get_table("t")
        assert table.graphs["V"] is not None          # loaded, not rebuilt
        assert table.graphs["V"].num_rows == 300
        follower.stop()


class TestConcurrentRebuild:
    def test_insert_and_query_during_rebuild(self, tmp_path):
        """Queries and inserts stay correct while rebuild() runs
        (reference InsertAndQueryDenseVectorDuringRebuild)."""
        vdb.load_db("cdb", str(tmp_path / "cdb"))
        vdb.use_db("cdb")
        vdb.create_table("t", SCHEMA["fields"] and [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
             "metricType": "EUCLIDEAN"}])
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2000, 8)).astype(np.float32)
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(500)])

        errors = []
        stop = threading.Event()

        def rebuild_loop():
            try:
                for _ in range(3):
                    vdb.rebuild()
            except Exception as e:
                errors.append(e)
            finally:
                stop.set()

        def insert_loop():
            i = 500
            try:
                while not stop.is_set() and i < 2000:
                    vdb.insert("t", [{"ID": j, "V": x[j].tolist()}
                                     for j in range(i, i + 100)])
                    i += 100
            except Exception as e:
                errors.append(e)

        def query_loop():
            try:
                while not stop.is_set():
                    _, res = vdb.query("t", "V", x[42].tolist(), ["ID"], 1)
                    assert res[0]["ID"] == 42, res
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=f)
                   for f in (rebuild_loop, insert_loop, query_loop)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        # All inserted rows searchable afterwards.
        _, res = vdb.query("t", "V", x[42].tolist(), ["ID"], 1)
        assert res[0]["ID"] == 42
        code, stats = vdb.statistics()
        assert stats["tables"][0]["totalRecordCount"] >= 500
