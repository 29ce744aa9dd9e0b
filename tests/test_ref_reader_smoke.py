"""Exported artifacts verified by the REFERENCE ENGINE'S OWN C++ readers.

benchmarks/ref_reader_smoke.cpp compiles the unmodified reference loaders
(table_segment_mvp.cpp:133-295, ann_graph_segment.cpp:39-98) and opens a
directory written by Table.export_reference_format: record/PK/vector/
deleted-bitset equality plus a greedy best-first walk over the loaded CSR
graph (self-queries must reach themselves). This is the round-trip the
compat tests could not prove alone — the bytes are accepted by the
reference's code, not by our re-implementation of its format.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import vectordb_tpu as vdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/engine"
BUILD_DIR = "/tmp/refreader"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_reference_cpp_readers_accept_export(tmp_path):
    # Build (object cache in /tmp/refreader makes re-runs cheap).
    r = subprocess.run(
        ["bash", os.path.join(REPO, "benchmarks", "build_ref_reader.sh"),
         BUILD_DIR], capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    smoke = os.path.join(BUILD_DIR, "ref_reader_smoke")

    n, dim = 500, 16
    rng = np.random.default_rng(11)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    d = str(tmp_path / "expdb")
    vdb.load_db("expdb", d)
    vdb.use_db("expdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert_columns("t", {"ID": np.arange(n, dtype=np.int64) * 3,
                             "V": x}, n)
    deleted_pks = [30, 123 * 3]
    vdb.delete_by_pk("t", deleted_pks)
    assert vdb.rebuild() == 0
    assert vdb.export_reference_format("expdb") == 0

    table = vdb._db.databases["expdb"].tables["t"]
    seg = table.segment
    table_id = table.schema.id
    vfid = table.schema.field_map()["V"].id
    # Expectation files: the host source-of-truth the exporter serialized.
    vec_path = str(tmp_path / "vecs.f32")
    np.ascontiguousarray(seg.dense_host["V"][:n],
                         dtype=np.float32).tofile(vec_path)
    pk_path = str(tmp_path / "pks.i64")
    np.ascontiguousarray(seg.primitive_cols["ID"][:n],
                         dtype=np.int64).tofile(pk_path)
    deleted_rows = [int(np.nonzero(
        seg.primitive_cols["ID"][:n] == pk)[0][0]) for pk in deleted_pks]

    r = subprocess.run(
        [smoke, d, str(table_id), str(n), str(dim), str(vfid),
         vec_path, pk_path, str(seg.first_record_id)]
        + [str(row) for row in deleted_rows],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ref_reader_smoke OK" in r.stdout

@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_reference_wal_replay_accepts_our_text_wal(tmp_path):
    """A text WAL written by THIS engine (WalTextFormat=true: insert,
    upsert, delete-with-pk-list, delete-with-filter) replays through the
    reference's compiled WriteAheadLog::Replay into a fresh
    TableSegmentMVP bit-for-bit (VERDICT r4 next #9)."""
    from vectordb_tpu.config import global_config

    r = subprocess.run(
        ["bash", os.path.join(REPO, "benchmarks", "build_ref_reader.sh"),
         BUILD_DIR], capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    smoke = os.path.join(BUILD_DIR, "ref_wal_smoke")

    n, dim = 120, 8
    rng = np.random.default_rng(5)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    d = str(tmp_path / "waldb")
    ok, _ = global_config.update({"WalTextFormat": True})
    assert ok
    try:
        vdb.load_db("waldb", d)
        vdb.use_db("waldb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "BIGINT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        # Upsert rewrites row 7's vector in place.
        x[7] = rng.normal(size=dim).astype(np.float32)
        vdb.insert("t", [{"ID": 7, "V": x[7].tolist()}], upsert=True)
        # Two delete shapes: pk list, and pk-list+filter (both WAL forms).
        vdb.delete_by_pk("t", [3, 11])
        vdb.delete("t", [], "ID = 99")
        table = vdb._db.databases["waldb"].tables["t"]
        table_id = table.schema.id
        seg = table.segment
        # Both engines append on upsert and tombstone the old row, so the
        # replayed layout must equal OUR segment's: n rows (121: the
        # upsert appended), deleted = {old row 7, pk-deletes, filter-del}.
        n_rows = int(seg.record_number)
        assert n_rows == n + 1
        deleted_rows = np.nonzero(~seg.valid_mask()[:n_rows])[0]
        assert set(deleted_rows.tolist()) == {3, 7, 11, 99}
        vec_path = str(tmp_path / "vecs.f32")
        np.ascontiguousarray(seg.dense_host["V"][:n_rows],
                             dtype=np.float32).tofile(vec_path)
        pk_path = str(tmp_path / "pks.i64")
        np.ascontiguousarray(seg.primitive_cols["ID"][:n_rows],
                             dtype=np.int64).tofile(pk_path)
        vdb.unload_db("waldb")
    finally:
        global_config.update({"WalTextFormat": False})

    r = subprocess.run(
        [smoke, d, str(table_id), str(n_rows), str(dim), vec_path, pk_path]
        + [str(r_) for r_ in deleted_rows],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ref_wal_smoke OK" in r.stdout
