"""End-to-end engine tests through the epsilla-compatible module API.

Mirrors the reference gtest matrix (/root/reference/engine/test/engine/db/
db_server.cpp): per-metric insert+query correctness dense+sparse, filters,
delete-by-pk, upsert, capacity errors, persistence (snapshot + WAL replay),
facets, projection.
"""
import json
import os

import numpy as np
import pytest

import vectordb_tpu as vdb


def make_db(tmp_path, name="testdb"):
    assert vdb.load_db(name, str(tmp_path / name)) == 0
    vdb.use_db(name)
    return name


def dense_table(metric="EUCLIDEAN", name="t", dim=4):
    vdb.create_table(name, [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Doc", "dataType": "STRING"},
        {"name": "Embedding", "dataType": "VECTOR_FLOAT",
         "dimensions": dim, "metricType": metric},
    ])
    return name


RECORDS = [
    {"ID": 1, "Doc": "Berlin", "Embedding": [0.05, 0.61, 0.76, 0.74]},
    {"ID": 2, "Doc": "London", "Embedding": [0.19, 0.81, 0.75, 0.11]},
    {"ID": 3, "Doc": "Moscow", "Embedding": [0.36, 0.55, 0.47, 0.94]},
    {"ID": 4, "Doc": "SF", "Embedding": [0.18, 0.01, 0.85, 0.80]},
    {"ID": 5, "Doc": "Shanghai", "Embedding": [0.24, 0.18, 0.22, 0.44]},
]


class TestCRUD:
    def test_euclidean_query(self, tmp_path):
        make_db(tmp_path)
        dense_table("EUCLIDEAN")
        assert vdb.insert("t", RECORDS) == 0
        code, res = vdb.query("t", "Embedding", [0.35, 0.55, 0.47, 0.94],
                              ["Doc"], 2, "", True)
        assert code == 0
        assert [r["Doc"] for r in res] == ["Moscow", "Berlin"]
        assert res[0]["@distance"] == pytest.approx(0.0001, abs=1e-5)

    def test_cosine_query_normalized_distance(self, tmp_path):
        make_db(tmp_path)
        dense_table("COSINE")
        vdb.insert("t", RECORDS)
        q = [0.36, 0.55, 0.47, 0.94]
        code, res = vdb.query("t", "Embedding", q, ["Doc"], 1, "", True)
        assert code == 0
        assert res[0]["Doc"] == "Moscow"
        # cosine distance of identical direction is ~0
        assert res[0]["@distance"] == pytest.approx(0.0, abs=1e-4)

    def test_dot_product(self, tmp_path):
        make_db(tmp_path)
        dense_table("DOT_PRODUCT")
        vdb.insert("t", RECORDS)
        q = [1.0, 1.0, 1.0, 1.0]
        code, res = vdb.query("t", "Embedding", q, ["Doc"], 5, "", True)
        ips = [-sum(r["Embedding"]) for r in RECORDS]
        want = [RECORDS[i]["Doc"] for i in np.argsort(ips)]
        assert [r["Doc"] for r in res] == want

    def test_filter_pushdown(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        code, res = vdb.query("t", "Embedding", [0.35, 0.55, 0.47, 0.94],
                              ["Doc", "ID"], 5, "ID < 3", True)
        assert code == 0
        assert all(r["ID"] < 3 for r in res)
        assert len(res) == 2

    def test_string_filter_and_like(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        _, res = vdb.query("t", "Embedding", [0.0] * 4, ["Doc"], 10,
                           "Doc LIKE '%on%'")
        assert sorted(r["Doc"] for r in res) == ["London"]

    def test_distance_filter(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        _, res = vdb.query("t", "Embedding", [0.35, 0.55, 0.47, 0.94],
                           ["Doc"], 5, "@distance < 0.01", True)
        assert [r["Doc"] for r in res] == ["Moscow"]

    def test_delete_by_pk_and_requery(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        assert vdb.delete_by_pk("t", [3]) == 0
        _, res = vdb.query("t", "Embedding", [0.35, 0.55, 0.47, 0.94],
                           ["Doc"], 5)
        assert "Moscow" not in [r["Doc"] for r in res]
        assert len(res) == 4

    def test_pk_dedup_skips(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        # Duplicate PK is skipped, not overwritten.
        vdb.insert("t", [{"ID": 1, "Doc": "Paris",
                          "Embedding": [1.0, 1.0, 1.0, 1.0]}])
        _, res = vdb.get("t", ["Doc"], primary_keys=[1])
        assert res[0]["Doc"] == "Berlin"

    def test_upsert_replaces(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        vdb.insert("t", [{"ID": 1, "Doc": "Paris",
                          "Embedding": [1.0, 1.0, 1.0, 1.0]}], upsert=True)
        _, res = vdb.get("t", ["Doc"], primary_keys=[1])
        assert res[0]["Doc"] == "Paris"
        code, stats = vdb.statistics()
        assert stats["tables"][0]["totalRecordCount"] == 5

    def test_missing_field_rejected(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        code = vdb.insert("t", [{"ID": 9, "Embedding": [0.0] * 4}])
        assert code != 0

    def test_wrong_dim_skipped(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        code = vdb.insert("t", [{"ID": 9, "Doc": "x", "Embedding": [0.0] * 3}])
        assert code == 0  # batch accepted, row skipped
        _, res = vdb.get("t", ["ID"])
        assert len(res) == 0

    def test_capacity_error(self, tmp_path):
        name = "capdb"
        assert vdb.load_db(name, str(tmp_path / name), vector_scale=3) == 0
        vdb.use_db(name)
        dense_table()
        code = vdb.insert("t", RECORDS)  # 5 > 3
        assert code != 0

    def test_query_dimension_mismatch(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        with pytest.raises(Exception):
            vdb.query("t", "Embedding", [0.1, 0.2], ["Doc"], 1)

    def test_default_query_field(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        code, res = vdb.query("t", "", [0.35, 0.55, 0.47, 0.94], ["Doc"], 1)
        assert res[0]["Doc"] == "Moscow"

    def test_drop_table(self, tmp_path):
        make_db(tmp_path)
        dense_table()
        assert vdb.drop_table("t") == 0
        with pytest.raises(Exception):
            vdb.query("t", "Embedding", [0.0] * 4, ["Doc"], 1)


class TestSparse:
    def make(self, tmp_path, metric):
        make_db(tmp_path)
        vdb.create_table("s", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Vec", "dataType": "SPARSE_VECTOR_FLOAT",
             "dimensions": 100, "metricType": metric},
        ])
        vdb.insert("s", [
            {"ID": 1, "Vec": {"indices": [0, 5], "values": [1.0, 2.0]}},
            {"ID": 2, "Vec": {"indices": [5, 7], "values": [3.0, 1.0]}},
            {"ID": 3, "Vec": {"indices": [1], "values": [4.0]}},
        ])

    def test_sparse_ip(self, tmp_path):
        self.make(tmp_path, "DOT_PRODUCT")
        code, res = vdb.query(
            "s", "Vec", {"indices": [5], "values": [1.0]}, ["ID"], 3, "", True)
        assert [r["ID"] for r in res] == [2, 1, 3]

    def test_sparse_euclidean(self, tmp_path):
        self.make(tmp_path, "EUCLIDEAN")
        code, res = vdb.query(
            "s", "Vec", {"indices": [0, 5], "values": [1.0, 2.0]},
            ["ID"], 1, "", True)
        assert res[0]["ID"] == 1
        assert res[0]["@distance"] == pytest.approx(0.0, abs=1e-6)

    def test_invalid_sparse_rejected(self, tmp_path):
        self.make(tmp_path, "EUCLIDEAN")
        # non-increasing indices -> row skipped
        vdb.insert("s", [
            {"ID": 9, "Vec": {"indices": [5, 2], "values": [1.0, 1.0]}}])
        _, res = vdb.get("s", ["ID"], primary_keys=[9])
        assert res == []
        # out-of-dim index -> skipped
        vdb.insert("s", [
            {"ID": 10, "Vec": {"indices": [100], "values": [1.0]}}])
        _, res = vdb.get("s", ["ID"], primary_keys=[10])
        assert res == []


class TestPersistence:
    def test_dump_and_reload(self, tmp_path):
        name = make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        vdb.delete_by_pk("t", [5])
        assert vdb.dump_db(name, str(tmp_path / name)) == 0
        assert vdb.unload_db(name) == 0

        assert vdb.load_db(name, str(tmp_path / name)) == 0
        vdb.use_db(name)
        _, res = vdb.query("t", "Embedding", [0.35, 0.55, 0.47, 0.94],
                           ["Doc", "ID"], 10, "", True)
        assert len(res) == 4
        assert res[0]["Doc"] == "Moscow"

    def test_wal_replay_without_dump(self, tmp_path):
        name = make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        vdb.delete_by_pk("t", [2])
        # Unload WITHOUT dumping: WAL must reconstruct the state.
        assert vdb.unload_db(name) == 0
        assert vdb.load_db(name, str(tmp_path / name)) == 0
        vdb.use_db(name)
        _, res = vdb.get("t", ["ID"])
        assert sorted(r["ID"] for r in res) == [1, 3, 4, 5]

    def test_upsert_survives_replay(self, tmp_path):
        name = make_db(tmp_path)
        dense_table()
        vdb.insert("t", RECORDS)
        vdb.insert("t", [{"ID": 3, "Doc": "Kyiv",
                          "Embedding": [0.1, 0.1, 0.1, 0.1]}], upsert=True)
        vdb.unload_db(name)
        vdb.load_db(name, str(tmp_path / name))
        vdb.use_db(name)
        _, res = vdb.get("t", ["Doc"], primary_keys=[3])
        assert res[0]["Doc"] == "Kyiv"


class TestProjectAndFacets:
    def setup_table(self, tmp_path):
        make_db(tmp_path)
        vdb.create_table("p", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Cat", "dataType": "STRING"},
            {"name": "Price", "dataType": "DOUBLE"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
             "metricType": "EUCLIDEAN"},
        ])
        vdb.insert("p", [
            {"ID": i, "Cat": "a" if i % 2 == 0 else "b",
             "Price": float(i), "V": [float(i), 0.0]}
            for i in range(10)
        ])

    def test_get_with_skip_limit(self, tmp_path):
        self.setup_table(tmp_path)
        _, res = vdb.get("p", ["ID"], filter="ID >= 2", skip=2, limit=3)
        assert [r["ID"] for r in res] == [4, 5, 6]

    def test_get_by_pks(self, tmp_path):
        self.setup_table(tmp_path)
        _, res = vdb.get("p", ["ID", "Cat"], primary_keys=[7, 3, 99])
        assert sorted(r["ID"] for r in res) == [3, 7]

    def test_facets_groupby(self, tmp_path):
        self.setup_table(tmp_path)
        code, res, facets = vdb.get(
            "p", [], facets=[{"group": ["Cat"],
                              "aggregate": ["COUNT(*)", "SUM(Price)"]}])
        groups = {g["Cat"]: g for g in facets[0]}
        assert groups["a"]["COUNT(*)"] == 5
        assert groups["a"]["SUM(Price)"] == pytest.approx(0 + 2 + 4 + 6 + 8)
        assert groups["b"]["COUNT(*)"] == 5

    def test_facets_global(self, tmp_path):
        self.setup_table(tmp_path)
        code, res, facets = vdb.get(
            "p", [], facets=[{"group": [],
                              "aggregate": ["MIN(Price)", "MAX(Price)"]}])
        assert facets[0][0]["MIN(Price)"] == pytest.approx(0.0)
        assert facets[0][0]["MAX(Price)"] == pytest.approx(9.0)

    def test_facets_on_query(self, tmp_path):
        self.setup_table(tmp_path)
        code, res, facets = vdb.query(
            "p", "V", [0.0, 0.0], ["ID"], 4, "", False,
            facets=[{"group": ["Cat"], "aggregate": ["COUNT(*)"]}])
        total = sum(g["COUNT(*)"] for g in facets[0])
        assert total == 4

    def test_project_all_fields(self, tmp_path):
        self.setup_table(tmp_path)
        _, res = vdb.get("p", [], limit=1)
        assert set(res[0].keys()) == {"ID", "Cat", "Price", "V"}


class TestGeo:
    def test_nearby_filter(self, tmp_path):
        make_db(tmp_path)
        vdb.create_table("g", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Loc", "dataType": "GEO_POINT"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
             "metricType": "EUCLIDEAN"},
        ])
        vdb.insert("g", [
            {"ID": 1, "Loc": {"latitude": 37.0, "longitude": -122.0},
             "V": [0.0, 0.0]},
            {"ID": 2, "Loc": {"latitude": 37.001, "longitude": -122.0},
             "V": [1.0, 0.0]},
            {"ID": 3, "Loc": {"latitude": 48.0, "longitude": 2.0},
             "V": [2.0, 0.0]},
        ])
        _, res = vdb.get("g", ["ID"],
                         filter="NEARBY(Loc, 37.0, -122.0, 10)")
        assert sorted(r["ID"] for r in res) == [1, 2]
        _, res = vdb.query("g", "V", [0.0, 0.0], ["ID"], 10,
                           "NEARBY(Loc, 48.0, 2.0, 10)")
        assert [r["ID"] for r in res] == [3]


class TestHighDim:
    def test_960d_gist_like(self, tmp_path):
        """GIST-960-style dimensionality pads to 1024 lanes cleanly."""
        import vectordb_tpu as vdb
        vdb.load_db("g960", str(tmp_path / "g960"), vector_scale=600)
        vdb.use_db("g960")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 960,
             "metricType": "EUCLIDEAN"}])
        rng = np.random.default_rng(0)
        x = rng.normal(size=(600, 960)).astype(np.float32)
        code, result = vdb.insert_columns(
            "t", {"ID": np.arange(600), "V": x})
        assert result["inserted"] == 600
        vdb.rebuild()  # graph build at 960-d
        _, res = vdb.query("t", "V", x[123].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == 123
        assert res[0]["@distance"] == pytest.approx(0.0, abs=1e-2)


class TestSparseFilter:
    def test_sparse_query_with_filter(self, tmp_path):
        """Metadata filters compose with sparse vector queries
        (reference filters-on-sparse gtest)."""
        import vectordb_tpu as vdb
        make_db(tmp_path)
        vdb.create_table("sf", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Cat", "dataType": "STRING"},
            {"name": "Vec", "dataType": "SPARSE_VECTOR_FLOAT",
             "dimensions": 50, "metricType": "DOT_PRODUCT"}])
        vdb.insert("sf", [
            {"ID": i, "Cat": "a" if i % 2 == 0 else "b",
             "Vec": {"indices": [i % 50], "values": [float(i + 1)]}}
            for i in range(20)])
        code, res = vdb.query(
            "sf", "Vec", {"indices": [5], "values": [1.0]},
            ["ID", "Cat"], 5, "Cat = 'b'", True)
        assert all(r["Cat"] == "b" for r in res)
        # row 5 has index 5 value 6.0 and Cat 'b' -> best
        assert res[0]["ID"] == 5


class TestTuneSearch:
    def test_tune_search_picks_ef_and_persists(self, tmp_path):
        """tune_search selects the smallest beam width meeting the recall
        target, stores it as the field override (used by later queries),
        and persists it across a reload."""
        name = make_db(tmp_path, "tunedb")
        dense_table("EUCLIDEAN", "t", dim=16)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1500, 16)).astype(np.float32)
        vdb.insert("t", [{"ID": i, "Doc": f"d{i}",
                          "Embedding": x[i].tolist()}
                         for i in range(1500)])
        assert vdb.rebuild() == 0
        code, report = vdb.tune_search("t", target_recall=0.95, sample=64)
        assert code == 0 and "Embedding" in report
        rep = report["Embedding"]
        assert rep["recall"] >= 0.95
        assert rep["ef"] in (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)
        tbl = vdb._db.databases["tunedb"].tables["t"]
        assert tbl.search_ef_override["Embedding"] == rep["ef"]
        # Query path still correct with the tuned ef.
        code, res = vdb.query("t", "Embedding", x[7].tolist(), ["ID"], 5,
                              "", False)
        assert res[0]["ID"] == 7

        # Tuned value persists across unload/reload.
        vdb.unload_db("tunedb")
        assert vdb.load_db("tunedb", str(tmp_path / "tunedb")) == 0
        vdb.use_db("tunedb")
        tbl2 = vdb._db.databases["tunedb"].tables["t"]
        assert tbl2.search_ef_override["Embedding"] == rep["ef"]

    def test_tune_search_rest_endpoint(self, tmp_path):
        from tests.test_rest import call
        from vectordb_tpu.rest.server import RestServer

        import vectordb_tpu as v
        name = make_db(tmp_path, "tunerest")
        dense_table("EUCLIDEAN", "tt", dim=8)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(800, 8)).astype(np.float32)
        vdb.insert("tt", [{"ID": i, "Doc": f"d{i}",
                           "Embedding": x[i].tolist()}
                          for i in range(800)])
        assert vdb.rebuild() == 0
        rest = RestServer(v._db)
        code, resp = call(rest, "POST", "/api/tunerest/data/tunesearch",
                          {"table": "tt", "targetRecall": 0.9,
                           "sample": 32})
        assert code == 200, resp
        assert "Embedding" in resp["result"]
        code, resp = call(rest, "POST", "/api/tunerest/data/tunesearch",
                          {"table": "missing"})
        assert code in (404, 500)


def test_tuned_sidecar_roundtrip_and_legacy(tmp_path):
    """tune_search_ef persists {"ef", "iters"} (r3 format) and reload
    applies both overrides; a legacy bare-int sidecar still loads."""
    import json as _json

    import numpy as np

    import vectordb_tpu as vdb

    rng = np.random.default_rng(31)
    x = rng.normal(size=(800, 16)).astype(np.float32)
    vdb.load_db("tdb", str(tmp_path / "tdb"))
    vdb.use_db("tdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 16,
         "metricType": "EUCLIDEAN"}])
    vdb.insert_columns("t", {"ID": np.arange(800), "V": x}, 800)
    vdb.rebuild()
    table = vdb._db.databases["tdb"].tables["t"]
    report = table.tune_search_ef(target_recall=0.9, sample=16, k=5)
    assert "V" in report and "iters" in report["V"]
    # OOD-robust tuning (r5): the tuned config's recall is measured on
    # self-queries AND noise-perturbed queries; a rung is accepted only
    # when both meet the target, and both figures are reported and
    # persisted for observability.
    assert 0.0 <= report["V"]["ood_recall"] <= 1.0
    assert 0.0 <= report["V"]["id_recall"] <= 1.0
    assert min(report["V"]["id_recall"],
               report["V"]["ood_recall"]) == report["V"]["recall"]
    assert all("ood_recall" in t for t in report["V"]["tried"])
    with open(table._tuned_ef_path()) as f:
        data = _json.load(f)
    assert data["V"]["ef"] == report["V"]["ef"]
    assert data["V"]["ood_recall"] == report["V"]["ood_recall"]
    vdb.unload_db("tdb")

    # Reload applies the sidecar; then a legacy int-format file too.
    vdb.load_db("tdb", str(tmp_path / "tdb"))
    vdb.use_db("tdb")
    table = vdb._db.databases["tdb"].tables["t"]
    assert table.search_ef_override["V"] == report["V"]["ef"]
    if report["V"]["iters"]:
        assert table.search_iters_override["V"] == report["V"]["iters"]
    with open(table._tuned_ef_path(), "w") as f:
        _json.dump({"V": 48}, f)
    table._load_tuned_ef()
    assert table.search_ef_override["V"] == 48
    vdb.unload_db("tdb")


class TestAutoTuneSearch:
    """AutoTuneSearch (r4): leader builds >= 20k rows auto-run the
    (ef, iters) ladder and persist the sidecar — served tables must not
    walk the static SearchEf default at full depth (the measured 0.28 s
    -> 15 ms serving group fix, NOTES_ROUND4 R4f)."""

    def _mk(self, tmp_path, name, n):
        import vectordb_tpu as vdb
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n, 16)).astype(np.float32)
        vdb.load_db(name, str(tmp_path / name), vector_scale=n + 8)
        vdb.use_db(name)
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 16,
             "metricType": "EUCLIDEAN"}])
        vdb.insert_columns("t", {"ID": np.arange(n), "V": x}, n)
        assert vdb.rebuild() == 0
        return vdb._db.databases[name].tables["t"]

    def test_large_leader_build_auto_tunes(self, tmp_path):
        table = self._mk(tmp_path, "autotune", 20_001)
        assert "V" in table.search_ef_override  # ladder ran + applied

    def test_small_table_skips_auto_tune(self, tmp_path):
        table = self._mk(tmp_path, "autosmall", 1_500)
        assert "V" not in table.search_ef_override

    def test_config_off_disables(self, tmp_path):
        from vectordb_tpu.config import global_config
        old = global_config.auto_tune_search
        global_config.auto_tune_search = False
        try:
            table = self._mk(tmp_path, "autooff", 20_001)
            assert "V" not in table.search_ef_override
        finally:
            global_config.auto_tune_search = old
