"""Reference-engine (EpsillaDB C++) on-disk artifact import.

A database directory written by the reference engine is a complete,
loadable input to this engine:

  - ``catalog``  — same JSON schema format (catalog.py already reads it);
  - ``<table_id>/wal/*.log`` — same text WAL line format (wal.py replays it);
  - ``<table_id>/data_mvp.bin`` — the reference's binary segment snapshot,
    parsed HERE (writer: /root/reference/engine/db/table_segment_mvp.cpp:
    939-1010, reader: 133-295);
  - ``<table_id>/ann_graph_<field_id>.bin`` — the reference's CSR ANN
    graph, parsed HERE into this engine's fixed-degree padded adjacency
    (writer: /root/reference/engine/db/ann_graph_segment.cpp:156-199).

So ``load_db`` pointed at a reference data directory migrates in place:
Table loads data_mvp.bin when this engine's own snapshot (data.vdb) is
absent, replays any newer WAL entries on top, and imports the CSR graph
when the npz graph is absent. Nothing is written back in reference format
(this engine persists its own snapshot/graph artifacts on the next
dump/rebuild, leaving the reference files untouched).

Binary layout of data_mvp.bin (all little-endian, no alignment padding):

  uint64  record_number
  int64   first_record_id
  int64   bitset_size;  uint8[bitset_size] deleted-bitmap, LSB-first per
          byte (concurrent_bitset.cpp:9-15: bit = byte[r>>3] >> (r&7))
  byte[record_number * primitive_offset] packed attribute rows — primitive
          fields in schema order at accumulated offsets of FieldTypeSizeMVP
          (table_segment_mvp.cpp:15-50): INT1/BOOL=1, INT2=2, INT4/FLOAT=4,
          INT8/DOUBLE=8, GEO_POINT=16 (two f64: lat, lon)
  per record x per var-len field (STRING/JSON/SPARSE_*, schema order):
          int64 byte_len + payload; sparse payload = byte_len/16 elements
          of {uint64 index; float32 value; 4 pad bytes} (sizeof
          SparseVectorElement with size_t alignment, vector.hpp:13-16)
  per dense vector field (schema order): float32[record_number * dim]
          (VECTOR_DOUBLE is also stored as float32 — vector_tables_ is
          float*, table_segment_mvp.cpp:989-991)
  int64   wal_global_id

Graph file layout (ann_graph_<field_id>.bin):

  uint64 record_number; int64 first_record_id;
  int64[record_number + 1] CSR offsets; int64[total_edges] neighbors;
  int64 navigation_point
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

import numpy as np

from .errors import DB_UNEXPECTED_ERROR, Status, VectorDBError
from .logger import logger
from .ops.sparse import SparseVector
from .schema import (DENSE_VECTOR_TYPES, INT_TYPES, SPARSE_VECTOR_TYPES,
                     FieldType, TableSchema)

# FieldTypeSizeMVP (table_segment_mvp.cpp:15-50) for the packed attribute
# row; var-len and dense fields do not live in the attribute table.
_PRIMITIVE_SIZES = {
    FieldType.INT1: 1,
    FieldType.INT2: 2,
    FieldType.INT4: 4,
    FieldType.INT8: 8,
    FieldType.FLOAT: 4,
    FieldType.DOUBLE: 8,
    FieldType.BOOL: 1,
    FieldType.GEO_POINT: 16,
}

_PRIMITIVE_NP = {
    FieldType.INT1: np.int8,
    FieldType.INT2: np.int16,
    FieldType.INT4: np.int32,
    FieldType.INT8: np.int64,
    FieldType.FLOAT: np.float32,
    FieldType.DOUBLE: np.float64,
    FieldType.BOOL: np.int8,  # stored as one byte; nonzero = True
}

_SPARSE_ELEM = np.dtype([("index", "<u8"), ("value", "<f4"), ("pad", "V4")])

VAR_LEN_TYPES = (FieldType.STRING, FieldType.JSON) + SPARSE_VECTOR_TYPES


def _classify(schema: TableSchema):
    """Replicates TableSegmentMVP::Init's layout walk
    (table_segment_mvp.cpp:52-100): primitive offsets, var-len field order,
    dense field order — all in schema field order."""
    prim: List[Tuple[object, int]] = []  # (field, offset)
    var_len: List[object] = []
    dense: List[object] = []
    offset = 0
    for f in schema.fields:
        ft = f.field_type
        if ft in VAR_LEN_TYPES:
            var_len.append(f)
        elif ft in DENSE_VECTOR_TYPES:
            dense.append(f)
        else:
            prim.append((f, offset))
            offset += _PRIMITIVE_SIZES[ft]
    return prim, var_len, dense, offset


def reference_segment_path(db_path: str, table_id: int) -> str:
    return os.path.join(db_path, str(table_id), "data_mvp.bin")


def reference_graph_path(db_path: str, table_id: int, field_id: int) -> str:
    return os.path.join(db_path, str(table_id), f"ann_graph_{field_id}.bin")


def load_reference_segment(path: str, schema: TableSchema, segment) -> None:
    """Populate an empty TableSegment from a reference data_mvp.bin."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def take(fmt: str):
        nonlocal off
        vals = struct.unpack_from(fmt, data, off)
        off += struct.calcsize(fmt)
        return vals[0] if len(vals) == 1 else vals

    n = take("<Q")
    first_record_id = take("<q")
    if n > segment.size_limit:
        raise VectorDBError(
            DB_UNEXPECTED_ERROR,
            f"The table contains {n} records, which is larger than provided "
            f"vector scale {segment.size_limit}")
    bitset_size = take("<q")
    bitset = np.frombuffer(data, dtype=np.uint8, count=bitset_size,
                           offset=off)
    off += bitset_size
    deleted = np.unpackbits(bitset, bitorder="little")[:n].astype(bool)
    if len(deleted) < n:  # snapshot bitmap shorter than row count
        deleted = np.pad(deleted, (0, n - len(deleted)))

    prim, var_len, dense, stride = _classify(schema)

    # Packed attribute rows -> per-column numpy views.
    attr = np.frombuffer(data, dtype=np.uint8, count=n * stride,
                         offset=off).reshape(n, stride) if stride else None
    off += n * stride
    for f, col_off in prim:
        ft = f.field_type
        if ft == FieldType.GEO_POINT:
            raw = np.ascontiguousarray(attr[:, col_off:col_off + 16])
            pair = raw.view("<f8").reshape(n, 2)
            segment.geo_cols[f.name][0][:n] = pair[:, 0]
            segment.geo_cols[f.name][1][:n] = pair[:, 1]
        else:
            size = _PRIMITIVE_SIZES[ft]
            raw = np.ascontiguousarray(attr[:, col_off:col_off + size])
            vals = raw.view(np.dtype(_PRIMITIVE_NP[ft]).newbyteorder("<"))
            vals = vals.reshape(n)
            if ft == FieldType.BOOL:
                segment.primitive_cols[f.name][:n] = vals != 0
            else:
                segment.primitive_cols[f.name][:n] = vals

    # Var-len table: record-major (load loop order matters,
    # table_segment_mvp.cpp:241-273). Lengths are interleaved with
    # payloads, so the walk is inherently sequential; the pre-bound Struct
    # keeps the per-field cost to two C calls (one-time migration cost —
    # the next dump persists in this engine's own columnar format).
    q8 = struct.Struct("<q")
    for r in range(n):
        for f in var_len:
            (ln,) = q8.unpack_from(data, off)
            off += 8
            payload = data[off:off + ln]
            off += ln
            if f.field_type in SPARSE_VECTOR_TYPES:
                el = np.frombuffer(payload, dtype=_SPARSE_ELEM)
                segment.sparse_cols[f.name][r] = SparseVector(
                    el["index"].astype(np.int64),
                    el["value"].astype(np.float32))
            else:
                segment.varlen_cols[f.name][r] = payload.decode(
                    "utf-8", errors="replace")

    # Dense vector tables (always float32 on disk).
    for f in dense:
        d = f.vector_dimension
        mat = np.frombuffer(data, dtype="<f4", count=n * d,
                            offset=off).reshape(n, d)
        off += n * d * 4
        segment.dense_host[f.name][:n] = mat
        segment.dense_norms[f.name][:n] = np.einsum(
            "nd,nd->n", mat, mat).astype(np.float32)

    wal_global_id = take("<q")

    # NULL sidecar (written by save_reference_segment, absent for
    # directories produced by the C++ engine): restore None for var-len
    # values the reference format had to flatten to ""/empty-sparse.
    nulls_path = path + ".nulls.npz"
    if os.path.exists(nulls_path):
        with np.load(nulls_path) as z:
            for name in z.files:
                mask = np.unpackbits(z[name], bitorder="little")[:n]
                col = (segment.sparse_cols.get(name)
                       if name in segment.sparse_cols
                       else segment.varlen_cols.get(name))
                if col is None:
                    continue
                for r in np.nonzero(mask)[0].tolist():
                    col[r] = None

    segment.record_number = int(n)
    segment.first_record_id = int(first_record_id)
    segment.wal_global_id = int(wal_global_id)
    segment.deleted[:n] = deleted

    alive_rows = np.nonzero(~deleted)[0]
    # PK map + geo index rebuild (reference load ctor, 177-236).
    if segment.pk_field is not None:
        fld = schema.field_map()[segment.pk_field]
        if fld.field_type in INT_TYPES:
            keys = segment.primitive_cols[segment.pk_field][
                alive_rows].tolist()
        else:
            col = segment.varlen_cols[segment.pk_field]
            keys = [str(col[r]) for r in alive_rows.tolist()]
        # Reversed so a duplicated PK maps to its EARLIEST alive row,
        # matching the reference's addKeyIfNotExist on load (177-236) —
        # crash/replay artifacts can leave duplicate alive PKs on disk.
        segment.pk_map.update(zip(reversed(keys),
                                  reversed(alive_rows.tolist())))
    for name, (lat, lon) in segment.geo_cols.items():
        segment.geo_indices[name].bulk_insert(
            lat[alive_rows], lon[alive_rows], alive_rows)
    segment.skip_sync_disk = False  # persist in native format on next dump
    logger.info(f"Imported reference segment {path}: {n} rows "
                f"({len(alive_rows)} alive), wal_id {wal_global_id}")


def load_reference_graph(path: str, segment, field_name: str,
                         metric, max_degree: int = 64):
    """Reference CSR graph -> GraphIndex with fixed-degree padded adjacency.

    CSR rows longer than max_degree are truncated (the reference's
    SyncPrune emits neighbors nearest-first, nsg.cpp:540-580, so the kept
    prefix is the closest ones); shorter rows pad with -1. Traversal/seed
    semantics then match a natively built graph — representative seeding
    replaces the single navigation point, which is kept as a seed member.
    """
    from .index.graph import GraphIndex

    with open(path, "rb") as f:
        data = f.read()
    off = 0
    n, first_id = struct.unpack_from("<Qq", data, off)
    off += 16
    if n == 0:
        return None
    offsets = np.frombuffer(data, dtype="<i8", count=n + 1, offset=off)
    off += (n + 1) * 8
    total_edges = int(offsets[-1])
    neighbors = np.frombuffer(data, dtype="<i8", count=total_edges,
                              offset=off)
    off += total_edges * 8
    (nav,) = struct.unpack_from("<q", data, off)

    degrees = np.diff(offsets)
    r = int(min(max_degree, max(int(degrees.max(initial=1)), 1)))
    adjacency = np.full((n, r), -1, dtype=np.int32)
    # Vectorized CSR -> padded: rank of each edge within its row.
    rank = np.arange(total_edges, dtype=np.int64) - np.repeat(offsets[:-1],
                                                              degrees)
    keep = rank < r
    rows = np.repeat(np.arange(n, dtype=np.int64), degrees)[keep]
    adjacency[rows, rank[keep]] = neighbors[keep].astype(np.int32)
    logger.info(f"Imported reference CSR graph {path}: {n} rows, "
                f"{total_edges} edges, degree<= {r}, nav {nav}")
    return GraphIndex(segment, field_name, metric, adjacency, int(nav),
                      int(n))


# ---------------------------------------------------------------------------
# Export (two-way migration / rollback): write this engine's state as the
# reference's binary artifacts so the C++ engine can open the database.
# ---------------------------------------------------------------------------


def save_reference_segment(path: str, schema: TableSchema,
                           segment) -> None:
    """Write the segment as a reference-format data_mvp.bin
    (writer layout: table_segment_mvp.cpp:939-1010)."""
    from .utils import atomic_write_bytes

    n = segment.record_number
    prim, var_len, dense, stride = _classify(schema)
    out = bytearray()
    out += struct.pack("<Qq", n, segment.first_record_id)
    # Minimal bitmap: ceil(n/8) bytes, LSB-first — the reference reader
    # copies exactly bitset_size bytes into a capacity-sized bitset, so the
    # minimal form is safe for any init_table_scale >= n.
    bitset = np.packbits(segment.deleted[:n], bitorder="little")
    out += struct.pack("<q", len(bitset))
    out += bitset.tobytes()

    if stride:
        attr = np.zeros((n, stride), dtype=np.uint8)
        for f, col_off in prim:
            ft = f.field_type
            if ft == FieldType.GEO_POINT:
                lat, lon = segment.geo_cols[f.name]
                pair = np.empty((n, 2), dtype="<f8")
                pair[:, 0] = lat[:n]
                pair[:, 1] = lon[:n]
                attr[:, col_off:col_off + 16] = pair.view(
                    np.uint8).reshape(n, 16)
            else:
                size = _PRIMITIVE_SIZES[ft]
                vals = segment.primitive_cols[f.name][:n]
                if ft == FieldType.BOOL:
                    vals = vals.astype(np.int8)
                vals = np.ascontiguousarray(
                    vals.astype(np.dtype(_PRIMITIVE_NP[ft]).newbyteorder(
                        "<")))
                attr[:, col_off:col_off + size] = vals.view(
                    np.uint8).reshape(n, size)
        out += attr.tobytes()

    # The reference format cannot represent NULL var-len values (every row
    # stores a payload), so None exports as ""/empty-sparse. A sidecar
    # bitmap (ignored by the reference engine, consumed by our importer)
    # keeps the round trip lossless for NULLs.
    null_maps = {}
    for r_idx in range(n):
        for f in var_len:
            if f.field_type in SPARSE_VECTOR_TYPES:
                sv = segment.sparse_cols[f.name][r_idx]
                if sv is None:
                    payload = b""
                    null_maps.setdefault(
                        f.name, np.zeros(n, bool))[r_idx] = True
                else:
                    el = np.zeros(len(sv.indices), dtype=_SPARSE_ELEM)
                    el["index"] = sv.indices.astype(np.uint64)
                    el["value"] = sv.values.astype(np.float32)
                    payload = el.tobytes()
            else:
                v = segment.varlen_cols[f.name][r_idx]
                if v is None:
                    null_maps.setdefault(
                        f.name, np.zeros(n, bool))[r_idx] = True
                payload = ("" if v is None else str(v)).encode("utf-8")
            out += struct.pack("<q", len(payload)) + payload

    for f in dense:
        out += np.ascontiguousarray(
            segment.dense_host[f.name][:n], dtype="<f4").tobytes()
    out += struct.pack("<q", segment.wal_global_id)
    atomic_write_bytes(path, bytes(out))
    nulls_path = path + ".nulls.npz"
    if null_maps:
        import io

        buf = io.BytesIO()
        np.savez(buf, **{k: np.packbits(v, bitorder="little")
                         for k, v in null_maps.items()})
        atomic_write_bytes(nulls_path, buf.getvalue())
    elif os.path.exists(nulls_path):
        os.remove(nulls_path)  # stale sidecar from an earlier export
    logger.info(f"Exported reference segment {path}: {n} rows"
                + (f", NULL sidecar for {sorted(null_maps)}"
                   if null_maps else ""))


def save_reference_graph(path: str, graph, first_record_id: int = 0) -> None:
    """Write a GraphIndex as a reference-format CSR graph
    (writer layout: ann_graph_segment.cpp:156-199). Padding (-1) entries
    are dropped; edge order within a row is preserved.
    `first_record_id` is the owning segment's first record id — the
    reference reads it into ANNGraphSegment::first_record_id_, and it must
    agree with the data_mvp.bin written by save_reference_segment."""
    from .utils import atomic_write_bytes

    adj = graph.adjacency_host[: graph.num_rows]
    n = int(graph.num_rows)
    valid = adj >= 0
    degrees = valid.sum(axis=1).astype(np.int64)
    offsets = np.zeros(n + 1, dtype="<i8")
    np.cumsum(degrees, out=offsets[1:])
    neighbors = adj[valid].astype("<i8")  # row-major: row order preserved
    out = bytearray()
    out += struct.pack("<Qq", n, int(first_record_id))
    out += offsets.tobytes()
    out += neighbors.tobytes()
    out += struct.pack("<q", int(graph.nav_point))
    atomic_write_bytes(path, bytes(out))
    logger.info(f"Exported reference CSR graph {path}: {n} rows, "
                f"{int(offsets[-1])} edges")
