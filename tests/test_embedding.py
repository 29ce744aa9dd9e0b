"""Embedding service client + auto-embedding flow against a mock sidecar."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.errors import VectorDBError
from vectordb_tpu.services import EmbeddingService

DIM = 4


def _embed(text):
    """Deterministic toy embedding: hash-based."""
    h = abs(hash(text))
    v = np.asarray([(h >> (8 * i)) % 251 for i in range(DIM)], np.float32)
    return (v / (np.linalg.norm(v) + 1e-9)).tolist()


class MockSidecar(BaseHTTPRequestHandler):
    fail_next = 0

    def _send(self, obj, code=200):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self._send({"statusCode": 200, "result": [
            {"model": "BAAI/bge-small-en-v1.5", "dim": DIM, "dense": True,
             "dimensionReduction": False}]})

    def do_POST(self):
        if MockSidecar.fail_next > 0:
            MockSidecar.fail_next -= 1
            self._send({"statusCode": 500, "message": "transient"}, 200)
            return
        body = json.loads(self.rfile.read(
            int(self.headers["Content-Length"])))
        docs = body.get("documents", [])
        self._send({"statusCode": 200,
                    "result": [_embed(d) for d in docs]})

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def sidecar():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), MockSidecar)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


class TestClient:
    def test_models(self, sidecar):
        svc = EmbeddingService(sidecar)
        models = svc.get_supported_models()
        assert models[0].model == "BAAI/bge-small-en-v1.5"
        assert models[0].dim == DIM

    def test_embed_documents(self, sidecar):
        svc = EmbeddingService(sidecar)
        out = svc.dense_embed_documents("BAAI/bge-small-en-v1.5",
                                        ["hello", "world"], DIM, {})
        assert len(out) == 2 and len(out[0]) == DIM

    def test_embed_query_retries_transient_failure(self, sidecar):
        svc = EmbeddingService(sidecar)
        MockSidecar.fail_next = 1
        out = svc.dense_embed_query("BAAI/bge-small-en-v1.5", "hi", DIM, {})
        assert len(out) == DIM

    def test_missing_provider_key(self, sidecar):
        svc = EmbeddingService(sidecar)
        with pytest.raises(VectorDBError, match="OpenAI API key"):
            svc.dense_embed_documents("openai/text-embedding-3-small",
                                      ["x"], DIM, {})


class TestAutoEmbedding:
    def test_index_field_and_search_by_content(self, sidecar, tmp_path,
                                               monkeypatch):
        """Content index: hidden vector field auto-embedded at insert,
        searched via query text (reference db_server.cpp:512-600)."""
        from vectordb_tpu.db_server import DBServer

        eng = vdb._engine()
        eng.inject_embedding_service(EmbeddingService(sidecar))
        assert vdb.load_db("edb", str(tmp_path / "edb")) == 0
        vdb.use_db("edb")
        vdb.create_table("docs", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
        ], indices=[{"name": "DocIdx", "field": "Doc",
                     "model": "BAAI/bge-small-en-v1.5"}])
        table = eng.get_db("edb").get_table("docs")
        # Hidden index field appended with COSINE metric.
        hidden = table.schema.fields[-1]
        assert hidden.is_index_field and hidden.name == "DocIdx"
        assert hidden.vector_dimension == DIM

        vdb.insert("docs", [{"ID": 1, "Doc": "alpha"},
                            {"ID": 2, "Doc": "beta"},
                            {"ID": 3, "Doc": "gamma"}])
        # The embedding got stored.
        assert np.any(table.segment.dense_host["DocIdx"][0] != 0)

        # Search by content routes through the embedding service.
        status, rows, _ = eng.search_by_content(
            "edb", "docs", "", ["ID", "Doc"], "beta", 1, "", True, [], {})
        assert status.ok(), status.message
        assert rows[0]["ID"] == 2  # exact embedding match ranks first
