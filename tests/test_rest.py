"""REST API tests: endpoint paths, payloads, and response shapes match the
reference WebController (web_controller.hpp)."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from vectordb_tpu.db_server import DBServer
from vectordb_tpu.rest.server import RestServer, create_server

RECORDS = [
    {"ID": 1, "Doc": "Berlin", "Embedding": [0.05, 0.61, 0.76, 0.74]},
    {"ID": 2, "Doc": "London", "Embedding": [0.19, 0.81, 0.75, 0.11]},
    {"ID": 3, "Doc": "Moscow", "Embedding": [0.36, 0.55, 0.47, 0.94]},
]

SCHEMA = {
    "name": "t",
    "fields": [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Doc", "dataType": "STRING"},
        {"name": "Embedding", "dataType": "VECTOR_FLOAT", "dimensions": 4,
         "metricType": "EUCLIDEAN"},
    ],
}


@pytest.fixture
def rest(tmp_path):
    server = RestServer(DBServer())
    code, resp = server.dispatch(
        "POST", "/api/load",
        {"name": "db1", "path": str(tmp_path / "db1")}, {})
    assert code == 200, resp
    yield server
    server.db.stop()


def call(rest, method, path, body=None):
    code, payload = rest.dispatch(method, path, body, {})
    if isinstance(payload, (bytes, bytearray)):
        # Columnar hot path returns pre-encoded JSON; decode to what an
        # HTTP client sees so assertions stay payload-shape-agnostic.
        import json as _json
        payload = _json.loads(payload)
    return code, payload


class TestEndpoints:
    def test_state(self, rest):
        code, resp = call(rest, "GET", "/state")
        assert code == 200 and resp["message"] == "Server is online!"

    def test_root(self, rest):
        code, resp = call(rest, "GET", "/")
        assert code == 200 and isinstance(resp, str)

    def test_load_conflict(self, rest, tmp_path):
        code, resp = call(rest, "POST", "/api/load",
                          {"name": "db1", "path": str(tmp_path / "db1")})
        assert code == 409

    def test_crud_flow(self, rest):
        code, resp = call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        assert code == 200, resp
        code, resp = call(rest, "POST", "/api/db1/data/insert",
                          {"table": "t", "data": RECORDS})
        assert code == 200
        assert resp["result"]["inserted"] == 3

        code, resp = call(rest, "POST", "/api/db1/data/query",
                          {"table": "t", "queryField": "Embedding",
                           "queryVector": [0.36, 0.55, 0.47, 0.94],
                           "limit": 2, "response": ["Doc"],
                           "withDistance": True})
        assert code == 200
        assert resp["message"] == "Query search successfully."
        assert resp["result"][0]["Doc"] == "Moscow"
        assert "@distance" in resp["result"][0]

        code, resp = call(rest, "GET", "/api/db1/schema/tables/show")
        assert resp["result"] == ["t"]

        code, resp = call(rest, "GET", "/api/db1/statistics")
        assert resp["result"]["tables"][0]["totalRecordCount"] == 3

        code, resp = call(rest, "POST", "/api/db1/data/delete",
                          {"table": "t", "primaryKeys": [2]})
        assert code == 200 and resp["result"]["deleted"] == 1

        code, resp = call(rest, "POST", "/api/db1/data/get",
                          {"table": "t", "response": ["ID"]})
        assert sorted(r["ID"] for r in resp["result"]) == [1, 3]

        code, resp = call(rest, "DELETE", "/api/db1/schema/tables/t")
        assert code == 200

    def test_insertprepare(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        call(rest, "POST", "/api/db1/data/insert",
             {"table": "t", "data": RECORDS})
        code, resp = call(rest, "POST", "/api/db1/data/insertprepare",
                          {"table": "t", "primaryKeys": [1, 99]})
        assert code == 200
        assert resp["result"]["recordNumber"] == 3
        # bit i clear => pk exists (reference mask semantics)
        assert resp["result"]["masks"][0] & 1 == 0
        assert resp["result"]["masks"][0] & 2 == 2

    def test_query_validation(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        code, _ = call(rest, "POST", "/api/db1/data/query", {"table": "t"})
        assert code == 400  # missing limit
        code, _ = call(rest, "POST", "/api/db1/data/query",
                       {"table": "t", "limit": 5})
        assert code == 400  # no query or queryVector
        code, resp = call(rest, "POST", "/api/db1/data/query",
                          {"table": "t", "limit": 5,
                           "queryVector": [0.0] * 4,
                           "filter": "Bogus < 3"})
        assert code == 400  # invalid filter -> 400 per reference mapping

    def test_delete_validation(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        code, _ = call(rest, "POST", "/api/db1/data/delete", {"table": "t"})
        assert code == 400
        code, _ = call(rest, "POST", "/api/db1/data/delete",
                       {"table": "t", "primaryKeys": []})
        assert code == 400

    def test_facets_via_rest(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        call(rest, "POST", "/api/db1/data/insert",
             {"table": "t", "data": RECORDS})
        code, resp = call(rest, "POST", "/api/db1/data/query",
                          {"table": "t", "queryVector": [0.0] * 4,
                           "limit": 3, "response": [],
                           "facets": [{"group": [],
                                       "aggregate": ["COUNT(*)"]}]})
        assert code == 200
        assert resp["result"][0][0]["COUNT(*)"] == 3

    def test_config_endpoint(self, rest):
        code, resp = call(rest, "POST", "/api/config",
                          {"SearchEf": 64})
        assert code == 200
        from vectordb_tpu.config import global_config
        assert global_config.search_ef == 64
        global_config.search_ef = 128  # restore

    def test_config_build_search_params(self, rest):
        from vectordb_tpu.config import global_config
        old_l, old_it = (global_config.build_search_l,
                         global_config.build_search_iters)
        try:
            code, _ = call(rest, "POST", "/api/config",
                           {"BuildSearchL": 48, "BuildSearchIters": 16})
            assert code == 200
            assert global_config.build_search_l == 48
            assert global_config.build_search_iters == 16
            # Out-of-range values are rejected and leave config unchanged.
            code, _ = call(rest, "POST", "/api/config",
                           {"BuildSearchL": 4})
            assert code == 500
            assert global_config.build_search_l == 48
            # Transactional: a multi-key payload with ONE bad value leaves
            # every key unchanged, including the valid ones before it.
            code, _ = call(rest, "POST", "/api/config",
                           {"BuildSearchL": 96, "BuildSearchIters": 300})
            assert code == 500
            assert global_config.build_search_l == 48
            assert global_config.build_search_iters == 16
            code, _ = call(rest, "POST", "/api/config",
                           {"BuildSearchIters": 300})
            assert code == 500
            assert global_config.build_search_iters == 16
            # 0 = auto is accepted and resolves to the measured policy.
            code, _ = call(rest, "POST", "/api/config",
                           {"BuildSearchL": 0, "BuildSearchIters": 0})
            assert code == 200
            from vectordb_tpu.index.graph import resolve_build_search_params
            assert resolve_build_search_params() == (24, 8)
        finally:
            global_config.build_search_l = old_l
            global_config.build_search_iters = old_it

    def test_setleader(self, rest):
        code, resp = call(rest, "POST", "/api/setleader", {"leader": False})
        assert code == 200
        assert rest.db.is_leader is False

    def test_rebuild_endpoint(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        call(rest, "POST", "/api/db1/data/insert",
             {"table": "t", "data": RECORDS})
        code, resp = call(rest, "POST", "/api/rebuild")
        assert code == 200

    def test_describe(self, rest):
        call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
        code, resp = call(rest, "GET", "/api/db1/schema/tables/t/describe")
        assert code == 200
        names = [f["name"] for f in resp["result"]["fields"]]
        assert names == ["ID", "Doc", "Embedding"]


class TestLiveServer:
    def test_http_round_trip(self, tmp_path):
        httpd = create_server(0, DBServer(), host="127.0.0.1")
        port = httpd.server_address[1]
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            def post(path, body):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    data=json.dumps(body).encode(), method="POST",
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=10) as r:
                    return r.status, json.loads(r.read())

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/state", timeout=10) as r:
                assert json.loads(r.read())["message"] == "Server is online!"
            code, resp = post("/api/load",
                              {"name": "livedb",
                               "path": str(tmp_path / "livedb")})
            assert code == 200
            code, resp = post("/api/livedb/schema/tables", SCHEMA)
            assert code == 200
            code, resp = post("/api/livedb/data/insert",
                              {"table": "t", "data": RECORDS})
            assert code == 200
            code, resp = post("/api/livedb/data/query",
                              {"table": "t", "queryVector": [0.36, 0.55,
                                                             0.47, 0.94],
                               "limit": 1, "response": ["Doc"]})
            assert resp["result"][0]["Doc"] == "Moscow"
            # concurrent queries (reference test/concurrency/test.py)
            errors = []

            def worker():
                try:
                    for _ in range(5):
                        c, rr = post("/api/livedb/data/query",
                                     {"table": "t",
                                      "queryVector": [0.1] * 4,
                                      "limit": 2, "response": ["ID"]})
                        assert c == 200 and len(rr["result"]) == 2
                except Exception as e:
                    errors.append(e)

            threads = [threading.Thread(target=worker) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errors, errors
        finally:
            httpd.shutdown()


class TestQueryByContent:
    def test_rest_query_text_via_mock_sidecar(self, tmp_path):
        """POST data/query with `query` text routes through the embedding
        sidecar (reference SearchByContent path)."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        DIM = 4

        def embed(text):
            h = abs(hash(text))
            v = np.asarray([(h >> (8 * i)) % 251 for i in range(DIM)],
                           np.float32)
            return (v / (np.linalg.norm(v) + 1e-9)).tolist()

        class Sidecar(BaseHTTPRequestHandler):
            def _send(self, obj):
                data = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._send({"statusCode": 200, "result": [
                    {"model": "BAAI/bge-small-en-v1.5", "dim": DIM,
                     "dense": True, "dimensionReduction": False}]})

            def do_POST(self):
                body = json.loads(self.rfile.read(
                    int(self.headers["Content-Length"])))
                self._send({"statusCode": 200,
                            "result": [embed(t)
                                       for t in body.get("documents", [])]})

            def log_message(self, *a):
                pass

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), Sidecar)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            from vectordb_tpu.services import EmbeddingService

            eng = DBServer()
            eng.inject_embedding_service(EmbeddingService(
                f"http://127.0.0.1:{httpd.server_address[1]}"))
            rest = RestServer(eng)
            code, _ = rest.dispatch(
                "POST", "/api/load",
                {"name": "cdb", "path": str(tmp_path / "cdb")}, {})
            assert code == 200
            code, resp = rest.dispatch(
                "POST", "/api/cdb/schema/tables",
                {"name": "docs",
                 "fields": [
                     {"name": "ID", "dataType": "INT", "primaryKey": True},
                     {"name": "Doc", "dataType": "STRING"}],
                 "indices": [{"name": "DocIdx", "field": "Doc",
                              "model": "BAAI/bge-small-en-v1.5"}]}, {})
            assert code == 200, resp
            code, resp = rest.dispatch(
                "POST", "/api/cdb/data/insert",
                {"table": "docs", "data": [
                    {"ID": 1, "Doc": "alpha"},
                    {"ID": 2, "Doc": "beta"}]}, {})
            assert code == 200, resp
            code, resp = rest.dispatch(
                "POST", "/api/cdb/data/query",
                {"table": "docs", "query": "beta", "limit": 1,
                 "response": ["ID", "Doc"]}, {})
            assert code == 200, resp
            assert resp["result"][0]["ID"] == 2
            eng.stop()
        finally:
            httpd.shutdown()


def test_export_reference_endpoint(rest, tmp_path):
    import glob
    code, resp = call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
    assert code == 200
    code, resp = call(rest, "POST", "/api/db1/data/insert",
                      {"table": "t", "data": RECORDS})
    assert code == 200
    code, resp = call(rest, "POST", "/api/exportreference",
                      {"name": "db1"})
    assert code == 200, resp
    assert glob.glob(str(tmp_path / "db1" / "*" / "data_mvp.bin"))
    code, resp = call(rest, "POST", "/api/exportreference",
                      {"name": "nosuch"})
    assert code == 404


def test_columnar_query_payload_matches_dict_rows(rest):
    """The columnar hot-path bytes must decode to the same rows the
    classic dict projection produces (floats compared at f32 precision —
    the native encoder's documented %.9g wire behavior)."""
    schema = {
        "name": "mix",
        "fields": [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "Score", "dataType": "DOUBLE"},
            {"name": "Flag", "dataType": "BOOL"},
            {"name": "Meta", "dataType": "JSON"},
            {"name": "Embedding", "dataType": "VECTOR_FLOAT",
             "dimensions": 4, "metricType": "EUCLIDEAN"},
        ],
    }
    code, resp = call(rest, "POST", "/api/db1/schema/tables", schema)
    assert code == 200, resp
    records = [
        {"ID": i, "Doc": f"doc-{i}" if i != 2 else 'q"uo\\te',
         "Score": 0.1 * i, "Flag": i % 2 == 0,
         "Meta": {"k": i, "tags": ["a", "b"]} if i != 3 else None,
         "Embedding": [0.1 * i, 0.2, 0.3, 0.4 + 0.01 * i]}
        for i in range(1, 6)
    ]
    code, resp = call(rest, "POST", "/api/db1/data/insert",
                      {"table": "mix", "data": records})
    assert code == 200, resp

    qv = [0.2, 0.2, 0.3, 0.44]
    # Raw dispatch: the columnar hot path returns pre-encoded bytes.
    code, payload = rest.dispatch(
        "POST", "/api/db1/data/query",
        {"table": "mix", "queryField": "Embedding", "queryVector": qv,
         "limit": 4, "withDistance": True}, {})
    assert code == 200
    got = json.loads(payload)["result"] if isinstance(
        payload, (bytes, bytearray)) else payload["result"]

    # Reference path: same search through dict projection (columnar off).
    status, rows, _ = rest.db.search(
        "db1", "mix", "Embedding", [], np.asarray(qv, dtype=np.float32),
        4, "", True, None, columnar=False)
    assert status.ok()
    assert len(got) == len(rows) == 4
    for g, r in zip(got, rows):
        assert set(g.keys()) == set(r.keys())
        for k, v in r.items():
            if isinstance(v, float):
                assert g[k] == pytest.approx(v, rel=1e-6)
            elif isinstance(v, list) and v and isinstance(v[0], float):
                assert g[k] == pytest.approx(v, rel=1e-6)
            else:
                assert g[k] == v, (k, g[k], v)


def test_columnar_falls_back_without_native(rest, monkeypatch):
    """With the native encoder unavailable the columnar path must fall
    back to dict rows and still serve the request."""
    from vectordb_tpu import fastjson
    monkeypatch.setattr(fastjson, "_native_dumps_rows", None)
    code, resp = call(rest, "POST", "/api/db1/schema/tables", SCHEMA)
    assert code == 200, resp
    code, resp = call(rest, "POST", "/api/db1/data/insert",
                      {"table": "t", "data": RECORDS})
    assert code == 200
    code, resp = call(rest, "POST", "/api/db1/data/query",
                      {"table": "t", "queryField": "Embedding",
                       "queryVector": [0.36, 0.55, 0.47, 0.94],
                       "limit": 2, "response": ["Doc"],
                       "withDistance": True})
    assert code == 200
    assert resp["result"][0]["Doc"] == "Moscow"
