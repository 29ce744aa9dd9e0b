"""Reference-engine artifact import (compat.py): data_mvp.bin, CSR graph,
and the end-to-end migration path (catalog + segment + text WAL).

The fixture bytes are synthesized to the EXACT writer layout of the
reference (/root/reference/engine/db/table_segment_mvp.cpp:939-1010 and
ann_graph_segment.cpp:156-199), since the C++ engine itself isn't built in
the test environment.
"""
import json
import os
import shutil
import struct
import time

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu import compat
from vectordb_tpu.schema import (FieldSchema, FieldType, MetricType,
                                 TableSchema)
from vectordb_tpu.segment import TableSegment


def pack_reference_segment(schema, rows, deleted_rows=(), wal_id=7,
                           capacity=256):
    """Serialize rows to the reference's data_mvp.bin byte layout."""
    prim, var_len, dense, stride = compat._classify(schema)
    n = len(rows)
    out = bytearray()
    out += struct.pack("<Qq", n, 0)
    bitset = np.zeros(capacity // 8 + 1, np.uint8)
    for r in deleted_rows:
        bitset[r >> 3] |= 1 << (r & 7)
    out += struct.pack("<q", len(bitset))
    out += bitset.tobytes()
    fmt_map = {FieldType.INT1: "<b", FieldType.INT2: "<h",
               FieldType.INT4: "<i", FieldType.INT8: "<q",
               FieldType.FLOAT: "<f", FieldType.DOUBLE: "<d",
               FieldType.BOOL: "<b"}
    for row in rows:
        rec = bytearray(stride)
        for f, off in prim:
            v = row[f.name]
            if f.field_type == FieldType.GEO_POINT:
                struct.pack_into("<dd", rec, off,
                                 v["latitude"], v["longitude"])
            else:
                struct.pack_into(fmt_map[f.field_type], rec, off,
                                 int(v) if f.field_type != FieldType.FLOAT
                                 and f.field_type != FieldType.DOUBLE
                                 else v)
        out += rec
    for row in rows:
        for f in var_len:
            v = row[f.name]
            if f.field_type in (FieldType.SPARSE_VECTOR_FLOAT,
                                FieldType.SPARSE_VECTOR_DOUBLE):
                payload = b"".join(
                    struct.pack("<Qf4x", i, x)
                    for i, x in zip(v["indices"], v["values"]))
            else:
                payload = str(v).encode("utf-8")
            out += struct.pack("<q", len(payload)) + payload
    for f in dense:
        mat = np.asarray([row[f.name] for row in rows], np.float32)
        out += mat.tobytes()
    out += struct.pack("<q", wal_id)
    return bytes(out)


def full_schema():
    return TableSchema(id=0, name="t", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="Doc", field_type=FieldType.STRING),
        FieldSchema(id=2, name="Meta", field_type=FieldType.JSON),
        FieldSchema(id=3, name="Flag", field_type=FieldType.BOOL),
        FieldSchema(id=4, name="Score", field_type=FieldType.FLOAT),
        FieldSchema(id=5, name="Weight", field_type=FieldType.DOUBLE),
        FieldSchema(id=6, name="Big", field_type=FieldType.INT8),
        FieldSchema(id=7, name="Loc", field_type=FieldType.GEO_POINT),
        FieldSchema(id=8, name="Sparse",
                    field_type=FieldType.SPARSE_VECTOR_FLOAT,
                    vector_dimension=100, metric_type=MetricType.COSINE),
        FieldSchema(id=9, name="Vec", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=4, metric_type=MetricType.EUCLIDEAN),
    ])


ROWS = [
    {"ID": 1, "Doc": "Berlin", "Meta": '{"pop": 3}', "Flag": True,
     "Score": 1.5, "Weight": 2.25, "Big": 1 << 40,
     "Loc": {"latitude": 52.5, "longitude": 13.4},
     "Sparse": {"indices": [0, 7], "values": [0.6, 0.8]},
     "Vec": [1.0, 0.0, 0.0, 0.0]},
    {"ID": 2, "Doc": "Łódź", "Meta": '{"pop": 0.7}', "Flag": False,
     "Score": -2.0, "Weight": 0.5, "Big": -5,
     "Loc": {"latitude": 51.8, "longitude": 19.5},
     "Sparse": {"indices": [], "values": []},
     "Vec": [0.0, 1.0, 0.0, 0.0]},
    {"ID": 3, "Doc": "Quito", "Meta": "null", "Flag": True,
     "Score": 0.0, "Weight": -1.0, "Big": 0,
     "Loc": {"latitude": -0.2, "longitude": -78.5},
     "Sparse": {"indices": [3], "values": [1.0]},
     "Vec": [0.0, 0.0, 1.0, 0.0]},
]


class TestSegmentImport:
    def test_all_field_types_round_trip(self, tmp_path):
        schema = full_schema()
        blob = pack_reference_segment(schema, ROWS, deleted_rows=[1],
                                      wal_id=42)
        path = str(tmp_path / "data_mvp.bin")
        with open(path, "wb") as f:
            f.write(blob)
        seg = TableSegment(schema, capacity=64)
        compat.load_reference_segment(path, schema, seg)

        assert seg.record_number == 3
        assert seg.wal_global_id == 42
        assert list(seg.deleted[:3]) == [False, True, False]
        assert seg.primitive_cols["ID"][:3].tolist() == [1, 2, 3]
        assert seg.varlen_cols["Doc"][:3] == ["Berlin", "Łódź", "Quito"]
        assert seg.varlen_cols["Meta"][0] == '{"pop": 3}'
        assert seg.primitive_cols["Flag"][:3].tolist() == [True, False, True]
        assert seg.primitive_cols["Score"][:3] == pytest.approx(
            [1.5, -2.0, 0.0])
        assert seg.primitive_cols["Weight"][:3] == pytest.approx(
            [2.25, 0.5, -1.0])
        assert seg.primitive_cols["Big"][:3].tolist() == [1 << 40, -5, 0]
        assert seg.geo_cols["Loc"][0][:3] == pytest.approx(
            [52.5, 51.8, -0.2])
        assert seg.geo_cols["Loc"][1][:3] == pytest.approx(
            [13.4, 19.5, -78.5])
        sv = seg.sparse_cols["Sparse"][0]
        assert sv.indices.tolist() == [0, 7]
        assert sv.values.tolist() == pytest.approx([0.6, 0.8])
        empty = seg.sparse_cols["Sparse"][1]
        assert empty is not None and len(empty.indices) == 0
        assert seg.dense_host["Vec"][2].tolist() == [0.0, 0.0, 1.0, 0.0]
        assert seg.dense_norms["Vec"][0] == pytest.approx(1.0)
        # PK map skips the deleted row (reference load ctor, 177-236).
        assert seg.pk_map == {1: 0, 3: 2}
        # Geo index only contains alive rows.
        hits = seg.geo_indices["Loc"].search_within_radius(52.5, 13.4, 5.0)
        assert 0 in list(hits) and 1 not in list(hits)

    def test_capacity_guard(self, tmp_path):
        schema = full_schema()
        blob = pack_reference_segment(schema, ROWS)
        path = str(tmp_path / "data_mvp.bin")
        with open(path, "wb") as f:
            f.write(blob)
        seg = TableSegment(schema, capacity=2)
        with pytest.raises(Exception, match="larger than"):
            compat.load_reference_segment(path, schema, seg)


class TestEndToEndMigration:
    def test_load_reference_db_dir(self, tmp_path):
        """catalog (same JSON) + data_mvp.bin (imported) + text WAL
        (replayed on top) = drop-in migration."""
        db_path = str(tmp_path / "mig")
        assert vdb.load_db("mig", db_path) == 0
        vdb.use_db("mig")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "Vec", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "EUCLIDEAN"},
        ])
        tid = vdb._db.databases["mig"].tables["t"].schema.id
        vdb.unload_db("mig")

        # Wipe engine-native artifacts; lay down reference-format ones.
        tdir = os.path.join(db_path, str(tid))
        shutil.rmtree(tdir, ignore_errors=True)
        os.makedirs(os.path.join(tdir, "wal"))
        schema = TableSchema(id=tid, name="t", fields=[
            FieldSchema(id=0, name="ID", is_primary_key=True,
                        field_type=FieldType.INT4),
            FieldSchema(id=1, name="Doc", field_type=FieldType.STRING),
            FieldSchema(id=2, name="Vec", field_type=FieldType.VECTOR_FLOAT,
                        vector_dimension=4,
                        metric_type=MetricType.EUCLIDEAN),
        ])
        rows = [{"ID": i, "Doc": f"doc{i}",
                 "Vec": [float(i), 0.0, 0.0, 0.0]} for i in range(5)]
        blob = pack_reference_segment(schema, rows, deleted_rows=[4],
                                      wal_id=10)
        with open(os.path.join(tdir, "data_mvp.bin"), "wb") as f:
            f.write(blob)
        # Text WAL: id 10 already consumed (skipped), id 11 replayed.
        recs_old = [{"ID": 99, "Doc": "stale",
                     "Vec": [9.0, 9.0, 9.0, 9.0]}]
        recs_new = [{"ID": 100, "Doc": "fresh",
                     "Vec": [0.5, 0.0, 0.0, 0.0]}]
        with open(os.path.join(tdir, "wal", f"{int(time.time())}.log"),
                  "w") as f:
            f.write(f"10 1 {json.dumps(recs_old)}\n")
            f.write(f"11 1 {json.dumps(recs_new)}\n")

        assert vdb.load_db("mig", db_path) == 0
        vdb.use_db("mig")
        code, res = vdb.query("t", "Vec", [0.4, 0.0, 0.0, 0.0],
                              ["ID", "Doc"], 3)
        assert code == 0
        ids = [r["ID"] for r in res]
        assert ids[0] == 100          # WAL entry 11 replayed
        assert 99 not in ids          # WAL entry 10 skipped (<= wal_id)
        assert 0 in ids and 4 not in ids  # imported rows; deleted stays gone
        # PK semantics survive the import: dedup against imported rows.
        vdb.insert("t", [{"ID": 3, "Doc": "dup",
                          "Vec": [7.0, 0.0, 0.0, 0.0]}])
        code, res = vdb.query("t", "Vec", [3.0, 0.0, 0.0, 0.0], ["Doc"], 1)
        assert res[0]["Doc"] == "doc3"


class TestGraphImport:
    def test_csr_graph_import_and_search(self, tmp_path):
        rng = np.random.default_rng(0)
        n, dim, k = 2000, 16, 10
        x = rng.normal(size=(n, dim)).astype(np.float32)
        schema = TableSchema(id=0, name="g", fields=[
            FieldSchema(id=0, name="ID", is_primary_key=True,
                        field_type=FieldType.INT4),
            FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                        vector_dimension=dim,
                        metric_type=MetricType.EUCLIDEAN)])
        seg = TableSegment(schema, capacity=n)
        seg.record_number = n
        seg.dense_host["V"][:n] = x
        seg.dense_norms["V"][:n] = (x ** 2).sum(1)

        # Exact KNN graph -> CSR with VARIABLE row lengths (nearest-first,
        # like SyncPrune output).
        d = ((x ** 2).sum(1)[:, None] - 2.0 * (x @ x.T)
             + (x ** 2).sum(1)[None, :])
        np.fill_diagonal(d, np.inf)
        nbrs = np.argsort(d, axis=1)[:, :24]
        degs = rng.integers(8, 25, size=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(degs, out=offsets[1:])
        neigh = np.concatenate(
            [nbrs[i, : degs[i]] for i in range(n)]).astype(np.int64)
        nav = int(np.argmin(((x - x.mean(0)) ** 2).sum(1)))
        path = str(tmp_path / "ann_graph_1.bin")
        with open(path, "wb") as f:
            f.write(struct.pack("<Qq", n, 0))
            f.write(offsets.astype("<i8").tobytes())
            f.write(neigh.astype("<i8").tobytes())
            f.write(struct.pack("<q", nav))

        g = compat.load_reference_graph(path, seg, "V",
                                        MetricType.EUCLIDEAN)
        assert g.num_rows == n and g.nav_point == nav
        assert g.adjacency_host.shape[1] == 24
        # Row 0's imported neighbors = its nearest degs[0], -1 padded after.
        row0 = g.adjacency_host[0]
        assert row0[: degs[0]].tolist() == nbrs[0, : degs[0]].tolist()
        assert (row0[degs[0]:] == -1).all()

        # The imported graph actually navigates: recall vs brute force.
        from vectordb_tpu.ops.beam import beam_search
        q = x[:64] + 0.01 * rng.normal(size=(64, dim)).astype(np.float32)
        ids = beam_search(g, q, seg.valid_mask(), MetricType.EUCLIDEAN,
                          beam_width=64, term_width=16)
        dq = ((q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T)
              + (x ** 2).sum(1)[None, :])
        gt = np.argsort(dq, axis=1)[:, :k]
        hits = sum(len(set(ids[i, :k].tolist()) & set(gt[i].tolist()))
                   for i in range(64))
        assert hits / (64 * k) >= 0.95


class TestExportRoundTrip:
    def test_export_then_reimport_full_state(self, tmp_path):
        """export_reference_format writes data_mvp.bin + CSR graphs that
        this engine's own importer (byte-validated against the C++ writer
        sources) loads back identically — a full two-way migration
        round trip incl. the ANN graph."""
        import numpy as np

        db_path = str(tmp_path / "rt")
        vdb.load_db("rt", db_path)
        vdb.use_db("rt")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "Loc", "dataType": "GEO_POINT"},
            {"name": "Sp", "dataType": "SPARSE_VECTOR_FLOAT",
             "dimensions": 50, "metricType": "COSINE"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 8,
             "metricType": "EUCLIDEAN"},
        ])
        rng = np.random.default_rng(3)
        x = rng.normal(size=(600, 8)).astype(np.float32)
        recs = [{"ID": i, "Doc": f"d{i}",
                 "Loc": {"latitude": float(i % 90), "longitude": -float(i % 180)},
                 "Sp": {"indices": [i % 50], "values": [1.0]},
                 "V": x[i].tolist()} for i in range(600)]
        vdb.insert("t", recs)
        vdb.delete_by_pk("t", [17])
        assert vdb.rebuild() == 0           # builds the graph (n >= 100)
        code, before = vdb.query("t", "V", x[5].tolist(), ["ID", "Doc"],
                                 5, "", True)
        assert vdb.export_reference_format("rt") == 0
        vdb.unload_db("rt")

        # Remove this engine's own artifacts: only reference-format files
        # (+ catalog, shared format) remain.
        tid_dir = None
        import glob, os
        for p in glob.glob(db_path + "/*/data.vdb"):
            tid_dir = os.path.dirname(p)
            os.remove(p)
        for p in glob.glob(db_path + "/*/ann_graph_*.npz"):
            os.remove(p)
        assert tid_dir and os.path.exists(
            os.path.join(tid_dir, "data_mvp.bin"))
        assert glob.glob(db_path + "/*/ann_graph_*.bin")

        vdb.load_db("rt", db_path)
        vdb.use_db("rt")
        tbl = vdb._db.databases["rt"].tables["t"]
        assert tbl.segment.record_number == 600
        assert tbl.graphs["V"] is not None   # CSR graph imported
        code, after = vdb.query("t", "V", x[5].tolist(), ["ID", "Doc"],
                                5, "", True)
        assert [r["ID"] for r in after] == [r["ID"] for r in before]
        assert after[0]["@distance"] == pytest.approx(
            before[0]["@distance"])
        # Deleted row stays deleted; sparse and geo columns survive.
        assert 17 not in [r["ID"] for r in after]
        code, rows = vdb.get("t", ["Sp", "Loc", "Doc"], [5])
        assert rows[0]["Sp"] == {"indices": [5], "values": [1.0]}
        assert rows[0]["Loc"]["latitude"] == 5.0

    def test_export_preserves_nulls(self, tmp_path):
        """Never-set var-len values (None) survive an export->reimport
        round trip via the NULL sidecar; the reference format itself
        flattens them to ""/empty-sparse, which our importer restores."""
        import glob
        import os

        import numpy as np

        db_path = str(tmp_path / "nulls")
        vdb.load_db("nulls", db_path)
        vdb.use_db("nulls")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Doc", "dataType": "STRING"},
            {"name": "Sp", "dataType": "SPARSE_VECTOR_FLOAT",
             "dimensions": 10, "metricType": "COSINE"},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 4,
             "metricType": "EUCLIDEAN"},
        ])
        recs = [{"ID": i, "Doc": f"d{i}",
                 "Sp": {"indices": [i % 10], "values": [1.0]},
                 "V": np.eye(4)[i % 4].tolist()} for i in range(8)]
        vdb.insert("t", recs)
        seg = vdb._db.databases["nulls"].tables["t"].segment
        # Rows with never-set var-len values (insert_columns / partial WAL
        # replay leave None).
        seg.varlen_cols["Doc"][3] = None
        seg.sparse_cols["Sp"][5] = None
        assert vdb.export_reference_format("nulls") == 0
        tdir = os.path.dirname(glob.glob(db_path + "/*/data_mvp.bin")[0])
        assert os.path.exists(os.path.join(tdir, "data_mvp.bin.nulls.npz"))
        vdb.unload_db("nulls")
        for p in glob.glob(db_path + "/*/data.vdb"):
            os.remove(p)

        vdb.load_db("nulls", db_path)
        vdb.use_db("nulls")
        seg2 = vdb._db.databases["nulls"].tables["t"].segment
        assert seg2.varlen_cols["Doc"][3] is None
        assert seg2.varlen_cols["Doc"][2] == "d2"
        assert seg2.sparse_cols["Sp"][5] is None
        assert seg2.sparse_cols["Sp"][4] is not None

        # A second export with no NULLs left removes the stale sidecar.
        seg2.varlen_cols["Doc"][3] = "filled"
        from vectordb_tpu.ops.sparse import SparseVector
        seg2.sparse_cols["Sp"][5] = SparseVector(
            np.array([5]), np.array([1.0], np.float32))
        assert vdb.export_reference_format("nulls") == 0
        assert not os.path.exists(
            os.path.join(tdir, "data_mvp.bin.nulls.npz"))
        vdb.unload_db("nulls")
