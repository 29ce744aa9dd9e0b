"""Binary WAL, colcodec, native IO runtime, and reference-format interop."""
import json
import os
import struct
import zlib

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.colcodec import decode_columns, encode_columns
from vectordb_tpu.config import global_config
from vectordb_tpu.native import get_native
from vectordb_tpu.ops.sparse import SparseVector


class TestColCodec:
    def test_round_trip_all_kinds(self):
        cols = {
            "ids": np.arange(5, dtype=np.int64),
            "vecs": np.random.default_rng(0).normal(
                size=(5, 8)).astype(np.float32),
            "names": ["a", None, "c", "", "日本語"],
            "geo": (np.asarray([1.0, 2, 3, 4, 5]),
                    np.asarray([-1.0, -2, -3, -4, -5])),
            "sp": [SparseVector(np.asarray([1, 4], np.int64),
                                np.asarray([0.5, 0.25], np.float32)),
                   None, None,
                   SparseVector(np.asarray([0], np.int64),
                                np.asarray([1.0], np.float32)), None],
        }
        kinds = {"ids": "array", "vecs": "array", "names": "strings",
                 "geo": "geo", "sp": "sparse"}
        blob = encode_columns(cols, 5, kinds)
        out, n = decode_columns(blob)
        assert n == 5
        np.testing.assert_array_equal(out["ids"], cols["ids"])
        np.testing.assert_array_equal(out["vecs"], cols["vecs"])
        assert out["names"] == cols["names"]
        np.testing.assert_array_equal(out["geo"][0], cols["geo"][0])
        assert out["sp"][1] is None
        np.testing.assert_array_equal(out["sp"][0].indices,
                                      cols["sp"][0].indices)

    def test_empty_sparse_column_kind(self):
        blob = encode_columns({"sp": [None, None]}, 2, {"sp": "sparse"})
        out, _ = decode_columns(blob)
        assert out["sp"] == [None, None]


class TestNative:
    def test_native_crc_matches_zlib(self):
        native = get_native()
        if native is None:
            pytest.skip("native lib not built")
        data = os.urandom(100000)
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)

    def test_native_snapshot_write_atomic(self, tmp_path):
        native = get_native()
        if native is None:
            pytest.skip("native lib not built")
        path = str(tmp_path / "snap.bin")
        total = native.snapshot_write(path, b"HDR", [b"aaa", b"bbbb"])
        assert total == 3 + 3 + 4
        assert open(path, "rb").read() == b"HDRaaabbbb"
        assert not os.path.exists(path + ".tmp")


class TestBinaryWal:
    def test_binary_wal_replay(self, tmp_path):
        vdb.load_db("w1", str(tmp_path / "w1"))
        vdb.use_db("w1")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": [float(i)] * 4} for i in range(20)])
        vdb.insert("t", [{"ID": 3, "V": [9.0] * 4}], upsert=True)
        vdb.delete_by_pk("t", [7])
        # a .blog file must exist and carry frames
        wal_dir = tmp_path / "w1" / "0" / "wal"
        blogs = [f for f in os.listdir(wal_dir) if f.endswith(".blog")]
        assert blogs, os.listdir(wal_dir)
        # Unload WITHOUT dump -> replay reconstructs everything.
        vdb.unload_db("w1")
        vdb.load_db("w1", str(tmp_path / "w1"))
        vdb.use_db("w1")
        _, res = vdb.get("t", ["ID", "V"], primary_keys=[3])
        assert res[0]["V"] == [9.0] * 4
        _, res = vdb.get("t", ["ID"])
        assert len(res) == 19  # 20 - deleted

    def test_text_wal_mode_interop(self, tmp_path):
        """WalTextFormat writes the reference's text line format."""
        global_config.wal_text_format = True
        try:
            vdb.load_db("w2", str(tmp_path / "w2"))
            vdb.use_db("w2")
            vdb.create_table("t", [
                {"name": "ID", "dataType": "INT", "primaryKey": True},
                {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 2,
                 "metricType": "EUCLIDEAN"}])
            vdb.insert("t", [{"ID": 1, "V": [1.0, 2.0]}])
            wal_dir = tmp_path / "w2" / "0" / "wal"
            logs = sorted(f for f in os.listdir(wal_dir)
                          if f.endswith(".log"))
            lines = [ln for f in logs
                     for ln in open(wal_dir / f).read().splitlines() if ln]
            assert len(lines) == 1
            gid, etype, payload = lines[0].split(" ", 2)
            assert etype == "1"
            assert json.loads(payload)[0]["ID"] == 1
        finally:
            global_config.wal_text_format = False

    def test_replays_reference_style_text_wal(self, tmp_path):
        """A WAL written in the reference's text format replays here."""
        base = tmp_path / "w3"
        os.makedirs(base / "0" / "wal")
        with open(base / "0" / "wal" / "1700000000.log", "w") as f:
            f.write('1 1 [{"ID": 5, "V": [0.5, 0.5]}]\n')
            f.write('2 2 {"pk": [], "filter": "ID < 0"}\n')
        with open(base / "catalog", "w") as f:
            json.dump({"id": 0, "tables": [{
                "id": 0, "name": "t", "fields": [
                    {"id": 0, "name": "ID", "isPrimaryKey": True,
                     "fieldType": 3},
                    {"id": 1, "name": "V", "fieldType": 40,
                     "vectorDimension": 2, "metricType": 1}]}]}, f)
        vdb.load_db("w3", str(base))
        vdb.use_db("w3")
        _, res = vdb.get("t", ["ID", "V"])
        assert res == [{"ID": 5, "V": [0.5, 0.5]}]


class TestBulkInsert:
    def test_columnar_bulk_insert(self, tmp_path):
        vdb.load_db("bk", str(tmp_path / "bk"))
        vdb.use_db("bk")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
             "metricType": "EUCLIDEAN"}])
        x = np.random.default_rng(1).normal(size=(1000, 8)).astype(np.float32)
        code, result = vdb.insert_columns(
            "t", {"ID": np.arange(1000), "V": x})
        assert code == 0 and result["inserted"] == 1000
        _, res = vdb.query("t", "V", x[7].tolist(), ["ID"], 1)
        assert res[0]["ID"] == 7
        # dup pks skipped
        code, result = vdb.insert_columns(
            "t", {"ID": np.arange(10), "V": x[:10]})
        assert result["skipped"] == 10


def test_empty_sparse_vector_roundtrip():
    """An explicitly-ingested empty sparse vector must decode as empty,
    not None (replica scoring parity — ADVICE r1)."""
    import numpy as np
    from vectordb_tpu.colcodec import decode_columns, encode_columns
    from vectordb_tpu.ops.sparse import SparseVector

    col = [SparseVector(np.array([3], np.int64), np.array([1.0], np.float32)),
           SparseVector(np.zeros(0, np.int64), np.zeros(0, np.float32)),
           None]
    blob = encode_columns({"s": col}, 3, kinds={"s": "sparse"})
    out, n = decode_columns(blob)
    assert n == 3
    got = out["s"]
    assert got[0] is not None and list(got[0].indices) == [3]
    assert got[1] is not None and len(got[1].indices) == 0
    assert got[2] is None


def test_torn_text_wal_line_skipped(tmp_path):
    """A corrupted text WAL line is skipped; intact entries still replay."""
    from vectordb_tpu.wal import WriteAheadLog

    wal = WriteAheadLog(str(tmp_path), 0, is_leader=True)
    wal.write_entry(1, '{"a": 1}')
    wal.write_entry(1, '{"a": 2}')
    # Corrupt the middle of the log file with a torn line.
    logs = wal._sorted_log_files(".log")
    with open(logs[0], "a", encoding="utf-8") as f:
        f.write("garbage notanint {\n")
    wal.write_entry(1, '{"a": 3}')
    seen = []
    wal.replay(lambda gid, et, content: seen.append(content), 0)
    assert [c for c in seen] == ['{"a": 1}', '{"a": 2}', '{"a": 3}']
