"""Edge-case coverage: JSON fields, geo clamping, @distance arithmetic,
release endpoint, unload flush."""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.db_server import DBServer
from vectordb_tpu.rest.server import RestServer


def test_json_field_round_trip(tmp_path):
    vdb.load_db("j1", str(tmp_path / "j1"))
    vdb.use_db("j1")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Meta", "dataType": "JSON"},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    payload = {"tags": ["a", "b"], "nested": {"x": 1.5}}
    vdb.insert("t", [{"ID": 1, "Meta": payload, "V": [0.0, 0.0]}])
    _, rows = vdb.get("t", ["Meta"])
    assert rows[0]["Meta"] == payload
    # JSON fields cannot appear in filters (reference: unsupported type).
    with pytest.raises(Exception):
        vdb.get("t", ["ID"], filter="Meta = 'x'")
    # ... and survive WAL replay.
    vdb.unload_db("j1")
    vdb.load_db("j1", str(tmp_path / "j1"))
    vdb.use_db("j1")
    _, rows = vdb.get("t", ["Meta"])
    assert rows[0]["Meta"] == payload


def test_geo_point_clamping(tmp_path):
    """Out-of-range lat/lon clamp (reference table_segment_mvp.cpp:628-641)."""
    vdb.load_db("g1", str(tmp_path / "g1"))
    vdb.use_db("g1")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Loc", "dataType": "GEO_POINT"},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": 1, "Loc": {"latitude": 123.0,
                                       "longitude": -500.0},
                      "V": [0.0, 0.0]}])
    _, rows = vdb.get("t", ["Loc"])
    assert rows[0]["Loc"] == {"latitude": 90.0, "longitude": -180.0}


def test_distance_arithmetic_filter(tmp_path):
    vdb.load_db("d1", str(tmp_path / "d1"))
    vdb.use_db("d1")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": i, "V": [float(i), 0.0]} for i in range(5)])
    # d(q=0, row i) = i^2; keep i^2 * 2 < 9 -> ids 0,1,2
    _, res = vdb.query("t", "V", [0.0, 0.0], ["ID"], 5,
                       "@distance * 2 < 9", True)
    assert sorted(r["ID"] for r in res) == [0, 1, 2]


def test_release_endpoint(tmp_path):
    rest = RestServer(DBServer())
    code, _ = rest.dispatch("POST", "/api/load",
                            {"name": "r1", "path": str(tmp_path / "r1")}, {})
    assert code == 200
    code, resp = rest.dispatch("POST", "/api/r1/release", None, {})
    assert code == 200 and "Release" in resp["message"]
    # released db is gone
    code, _ = rest.dispatch("GET", "/api/r1/statistics", None, {})
    assert code == 500
    rest.db.stop()


def test_bool_and_int_widths_round_trip(tmp_path):
    vdb.load_db("w1", str(tmp_path / "w1"))
    vdb.use_db("w1")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
        {"name": "Tiny", "dataType": "TINYINT"},
        {"name": "Small", "dataType": "SMALLINT"},
        {"name": "Flag", "dataType": "BOOL"},
        {"name": "F", "dataType": "FLOAT"},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": 2**40, "Tiny": -7, "Small": 300, "Flag": True,
                      "F": 1.5, "V": [0.0, 0.0]}])
    _, rows = vdb.get("t", ["ID", "Tiny", "Small", "Flag", "F"])
    assert rows[0] == {"ID": 2**40, "Tiny": -7, "Small": 300,
                       "Flag": True, "F": 1.5}
    # filters over each width
    _, rows = vdb.get("t", ["ID"], filter="Tiny < 0 AND Small > 200 "
                                          "AND Flag = TRUE AND F > 1.0")
    assert len(rows) == 1
