"""Hybrid dense + sparse fusion search (BASELINE config-4)."""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.rest.server import RestServer


@pytest.fixture
def table(tmp_path):
    vdb.load_db("hdb", str(tmp_path / "hdb"))
    vdb.use_db("hdb")
    vdb.create_table("h", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Dense", "dataType": "VECTOR_FLOAT", "dimensions": 4,
         "metricType": "EUCLIDEAN"},
        {"name": "Sparse", "dataType": "SPARSE_VECTOR_FLOAT",
         "dimensions": 100, "metricType": "DOT_PRODUCT"},
    ])
    # Row 1: best dense match; row 2: best sparse match; row 3: decent both.
    vdb.insert("h", [
        {"ID": 1, "Dense": [1.0, 0.0, 0.0, 0.0],
         "Sparse": {"indices": [9], "values": [0.1]}},
        {"ID": 2, "Dense": [0.0, 1.0, 0.0, 0.0],
         "Sparse": {"indices": [5], "values": [5.0]}},
        {"ID": 3, "Dense": [0.9, 0.1, 0.0, 0.0],
         "Sparse": {"indices": [5], "values": [4.0]}},
        {"ID": 4, "Dense": [0.0, 0.0, 1.0, 0.0],
         "Sparse": {"indices": [7], "values": [1.0]}},
    ])
    return "h"


QUERIES = [
    {"field": "Dense", "vector": [1.0, 0.0, 0.0, 0.0], "weight": 1.0},
    {"field": "Sparse", "vector": {"indices": [5], "values": [1.0]},
     "weight": 1.0},
]


def test_rrf_fusion_ranks_both_modalities(table):
    code, rows = vdb.hybrid_query(table, QUERIES, ["ID"], 4, "", True)
    assert code == 0
    ids = [r["ID"] for r in rows]
    # Rows strong in at least one modality beat row 4 (weak in both).
    assert set(ids[:3]) == {1, 2, 3}
    assert ids[3] == 4
    # fused scores ascend (smaller @distance = better)
    d = [r["@distance"] for r in rows]
    assert d == sorted(d)


def test_weighted_fusion(table):
    code, rows = vdb.hybrid_query(table, QUERIES, ["ID"], 4, "", True,
                                  rerank="weighted")
    assert rows[0]["ID"] == 3


def test_weights_shift_ranking(table):
    heavy_dense = [
        {"field": "Dense", "vector": [1.0, 0.0, 0.0, 0.0], "weight": 10.0},
        {"field": "Sparse", "vector": {"indices": [5], "values": [1.0]},
         "weight": 0.1},
    ]
    code, rows = vdb.hybrid_query(table, heavy_dense, ["ID"], 1,
                                  rerank="weighted")
    assert rows[0]["ID"] == 1  # dense winner dominates


def test_hybrid_with_filter(table):
    code, rows = vdb.hybrid_query(table, QUERIES, ["ID"], 4, "ID <> 3")
    assert all(r["ID"] != 3 for r in rows)


def test_hybrid_via_rest(table):
    rest = RestServer(vdb._engine())
    code, resp = rest.dispatch(
        "POST", "/api/hdb/data/query",
        {"table": "h", "queryVectors": QUERIES, "limit": 2,
         "response": ["ID"], "withDistance": True}, {})
    assert code == 200
    assert {r["ID"] for r in resp["result"]} <= {1, 2, 3}
    assert len(resp["result"]) == 2
