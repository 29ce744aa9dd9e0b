"""Columnar in-memory table segment with HBM-resident dense vector columns.

TPU-native re-design of the reference's TableSegmentMVP
(/root/reference/engine/db/table_segment_mvp.{hpp,cpp}): the same data model —
fixed-capacity columnar segment, deleted bitset, PK maps, insert/upsert/delete
semantics, cosine normalization at ingest (table_segment_mvp.cpp:564-587),
capacity hard-error (476-481) — but the storage layout is built for XLA:

  - primitive attributes: one numpy array per column (not a packed row-stride
    byte table) so filters evaluate as whole-column vector ops;
  - dense vector fields: a float32 numpy host mirror (source of truth,
    persistence, exact re-rank) plus a device-side buffer in DeviceVectorStore
    that grows geometrically so the flat-scan kernel always sees a static,
    tile-aligned shape;
  - deleted rows: numpy bool mask, combined with filter masks into the
    device-side scan mask.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .errors import (DB_UNEXPECTED_ERROR, INVALID_RECORD, RECORD_NOT_FOUND,
                     Status, VectorDBError)
from .logger import logger
from .ops.sparse import SparseVector
from .schema import (DENSE_VECTOR_TYPES, INT_TYPES, PRIMITIVE_DTYPES,
                     FieldType, MetricType, TableSchema)
from .utils import atomic_write_bytes

# Device buffers grow by doubling from this floor; shapes stay tile-aligned
# (multiple of 8 sublanes x 128 lanes after padding) and jit re-traces only
# O(log N) times as the table grows.
MIN_DEVICE_CAPACITY = 4096

SPARSE_INDICES_KEY = "indices"
SPARSE_VALUES_KEY = "values"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class DeviceVectorStore:
    """Device-side mirror of one dense vector column.

    Holds a [cap_device, dim_padded] jax array (store dtype, default bfloat16
    for MXU throughput) plus float32 squared row norms. Appends are written
    with a donated dynamic_update_slice so no full-buffer copy happens on
    insert. The store is created lazily on first search.
    """

    def __init__(self, dim: int, dtype: str = "bfloat16"):
        import jax.numpy as jnp  # local import keeps module import light

        self.dim = dim
        self.dim_padded = _round_up(dim, 128)
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.capacity = 0
        self.length = 0  # rows uploaded so far
        self.buf = None  # [capacity, dim_padded] store dtype
        self.norms = None  # [capacity] f32 squared norms

    def _grow(self, needed: int, host: np.ndarray, norms_host: np.ndarray):
        import jax.numpy as jnp

        new_cap = max(MIN_DEVICE_CAPACITY, self.capacity or MIN_DEVICE_CAPACITY)
        while new_cap < needed:
            new_cap *= 2
        # Re-upload everything below `needed` into the fresh buffer; amortized
        # O(1) per row, same policy as a growable array.
        padded = np.zeros((new_cap, self.dim_padded), dtype=np.float32)
        padded[:needed, : self.dim] = host[:needed]
        self.buf = jnp.asarray(padded, dtype=self.dtype)
        nrm = np.zeros((new_cap,), dtype=np.float32)
        nrm[:needed] = norms_host[:needed]
        self.norms = jnp.asarray(nrm)
        self.capacity = new_cap
        self.length = needed

    def sync(self, host: np.ndarray, norms_host: np.ndarray, n_rows: int):
        """Bring the device buffer up to date with host rows [0, n_rows)."""
        import jax

        if n_rows > self.capacity or self.buf is None:
            self._grow(n_rows, host, norms_host)
            return
        if n_rows <= self.length:
            return
        start, stop = self.length, n_rows
        rows = np.zeros((stop - start, self.dim_padded), dtype=np.float32)
        rows[:, : self.dim] = host[start:stop]
        self.buf = _append_rows(self.buf, rows.astype(self.buf.dtype), start)
        self.norms = _append_norms(self.norms, norms_host[start:stop], start)
        self.length = stop

    def invalidate(self):
        self.buf = None
        self.norms = None
        self.capacity = 0
        self.length = 0


def _append_rows(buf, rows, start: int):
    import jax

    return _append_rows_jit(buf, rows, start)


def _append_norms(norms, new, start: int):
    import jax.numpy as jnp

    return _append_norms_jit(norms, jnp.asarray(new), start)


def _make_append_jits():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def append_rows(buf, rows, start):
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    @jax.jit
    def append_norms(norms, new, start):
        return jax.lax.dynamic_update_slice(norms, new, (start,))

    return append_rows, append_norms


_append_rows_jit, _append_norms_jit = None, None


def _ensure_jits():
    global _append_rows_jit, _append_norms_jit
    if _append_rows_jit is None:
        _append_rows_jit, _append_norms_jit = _make_append_jits()


class TableSegment:
    """Fixed-capacity columnar segment (reference table_segment_mvp.cpp)."""

    SNAPSHOT_VERSION = 1

    def __init__(self, schema: TableSchema, capacity: int = 150000,
                 vector_dtype: str = "bfloat16"):
        _ensure_jits()
        self.schema = schema
        self.size_limit = int(capacity)
        self.vector_dtype = vector_dtype
        self.record_number = 0
        self.first_record_id = 0
        self.wal_global_id = -1
        self.deleted = np.zeros(self.size_limit, dtype=bool)
        self.skip_sync_disk = True

        # Column stores.
        self.primitive_cols: Dict[str, np.ndarray] = {}
        self.geo_cols: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self.varlen_cols: Dict[str, List[Optional[str]]] = {}  # STRING/JSON
        self.sparse_cols: Dict[str, List[Optional[SparseVector]]] = {}
        self.dense_host: Dict[str, np.ndarray] = {}    # f32 [cap, D]
        self.dense_norms: Dict[str, np.ndarray] = {}   # f32 [cap] squared
        self.dense_device: Dict[str, DeviceVectorStore] = {}

        self.pk_field: Optional[str] = None
        self.pk_map: Dict[Any, int] = {}
        # Bumped on every insert/delete; used to invalidate cached device
        # masks without re-uploading them per query.
        self.mutation_version = 0

        for f in schema.fields:
            if f.is_primary_key:
                self.pk_field = f.name
            ft = f.field_type
            if ft in PRIMITIVE_DTYPES:
                self.primitive_cols[f.name] = np.zeros(
                    self.size_limit, dtype=PRIMITIVE_DTYPES[ft])
            elif ft == FieldType.GEO_POINT:
                self.geo_cols[f.name] = (
                    np.zeros(self.size_limit, dtype=np.float64),
                    np.zeros(self.size_limit, dtype=np.float64))
            elif ft in (FieldType.STRING, FieldType.JSON):
                self.varlen_cols[f.name] = [None] * self.size_limit
            elif ft in DENSE_VECTOR_TYPES:
                self.dense_host[f.name] = np.zeros(
                    (self.size_limit, f.vector_dimension), dtype=np.float32)
                self.dense_norms[f.name] = np.zeros(self.size_limit,
                                                    dtype=np.float32)
                self.dense_device[f.name] = DeviceVectorStore(
                    f.vector_dimension, vector_dtype)
            else:  # sparse vector
                self.sparse_cols[f.name] = [None] * self.size_limit

        self.data_lock = threading.RLock()

    # ------------------------------------------------------------------
    # Column access for the filter compiler.
    # ------------------------------------------------------------------

    def column(self, name: str):
        if name in self.primitive_cols:
            return self.primitive_cols[name]
        if name in self.geo_cols:
            return self.geo_cols[name]
        if name in self.varlen_cols:
            return np.asarray(self.varlen_cols[name], dtype=object)
        raise VectorDBError(DB_UNEXPECTED_ERROR, "Unknown column: " + name)

    # ------------------------------------------------------------------
    # PK helpers.
    # ------------------------------------------------------------------

    def _pk_value(self, record: Dict[str, Any], fld) -> Any:
        v = record[fld.name]
        if fld.field_type in INT_TYPES:
            return int(v)
        return str(v)

    def pk_to_id(self, pk: Any) -> Optional[int]:
        fld = self.schema.field_map().get(self.pk_field) if self.pk_field else None
        if fld is None:
            return None
        key = int(pk) if fld.field_type in INT_TYPES else str(pk)
        return self.pk_map.get(key)

    def is_int_pk(self) -> bool:
        if not self.pk_field:
            return False
        return self.schema.field_map()[self.pk_field].field_type in INT_TYPES

    def is_string_pk(self) -> bool:
        if not self.pk_field:
            return False
        return self.schema.field_map()[self.pk_field].field_type == FieldType.STRING

    # ------------------------------------------------------------------
    # Insert (reference table_segment_mvp.cpp:455-814).
    # ------------------------------------------------------------------

    def insert(self, records: List[Dict[str, Any]], wal_id: int = -1,
               upsert: bool = False,
               embedding_service=None,
               headers: Optional[Dict[str, str]] = None) -> Status:
        with self.data_lock:
            self.wal_global_id = wal_id
            n_new = len(records)
            if n_new == 0:
                return Status(0, '{"inserted": 0, "skipped": 0}')

            fmap = self.schema.field_map()
            # Validate all required fields exist up front (whole batch is
            # rejected, matching the reference).
            for i, rec in enumerate(records):
                for f in self.schema.fields:
                    if not f.is_index_field and f.name not in rec:
                        return Status(INVALID_RECORD,
                                      f"Record {i} missing field: {f.name}")

            if self.record_number + n_new > self.size_limit:
                return Status(
                    DB_UNEXPECTED_ERROR,
                    "Currently, each table in this database can hold up to "
                    f"{self.size_limit} records. To insert more records, "
                    "please unload the database and reload with a larger "
                    "vectorScale parameter.")

            skipped = 0
            cursor = self.record_number
            start = cursor
            upserts: List[Tuple[Any, int, int]] = []  # (pk, old_row, new_row)

            for i, rec in enumerate(records):
                row_ok = True
                # Validate vector payloads before writing anything row-wise.
                parsed: Dict[str, Any] = {}
                for f in self.schema.fields:
                    if f.is_index_field:
                        continue
                    ft = f.field_type
                    try:
                        if ft in DENSE_VECTOR_TYPES:
                            vec = np.asarray(rec[f.name], dtype=np.float32)
                            if vec.shape != (f.vector_dimension,):
                                logger.error(
                                    f"Record {i} field {f.name} has wrong "
                                    f"dimension, expecting: {f.vector_dimension}"
                                    f" actual: {vec.shape}")
                                row_ok = False
                                break
                            if f.metric_type == MetricType.COSINE:
                                s = float(np.dot(vec, vec))
                                if s > 1e-10:
                                    vec = vec / np.float32(np.sqrt(s))
                            parsed[f.name] = vec
                        elif ft in (FieldType.SPARSE_VECTOR_FLOAT,
                                    FieldType.SPARSE_VECTOR_DOUBLE):
                            sv = rec[f.name]
                            idx = np.asarray(sv.get(SPARSE_INDICES_KEY, []),
                                             dtype=np.int64)
                            val = np.asarray(sv.get(SPARSE_VALUES_KEY, []),
                                             dtype=np.float32)
                            if len(idx) != len(val):
                                logger.error(
                                    f"mismatched indices array length "
                                    f"({len(idx)}) and value array length "
                                    f"({len(val)}), skipping.")
                                row_ok = False
                                break
                            if len(idx) > 0:
                                if idx[-1] >= f.vector_dimension:
                                    logger.error(
                                        f"Record {i} field {f.name} has wrong "
                                        "dimension, expecting: "
                                        f"{f.vector_dimension} actual: "
                                        f"{int(idx[-1])}")
                                    row_ok = False
                                    break
                                if np.any(idx < 0):
                                    logger.error(
                                        "entry has negative index value, "
                                        "skipping.")
                                    row_ok = False
                                    break
                                if np.any(np.diff(idx) <= 0):
                                    logger.error(
                                        "the index is not increasing, "
                                        "skipping.")
                                    row_ok = False
                                    break
                            v = SparseVector(idx, val)
                            if f.metric_type == MetricType.COSINE:
                                v = v.normalized()
                            parsed[f.name] = v
                    except (TypeError, ValueError, KeyError) as e:
                        logger.error(f"Record {i} field {f.name} invalid: {e}")
                        row_ok = False
                        break
                if not row_ok:
                    skipped += 1
                    continue

                # PK dedup / upsert bookkeeping before committing the row.
                pk_key = None
                if self.pk_field is not None:
                    pk_key = self._pk_value(rec, fmap[self.pk_field])
                    old = self.pk_map.get(pk_key)
                    if old is not None:
                        if upsert:
                            upserts.append((pk_key, old, cursor))
                        else:
                            skipped += 1
                            continue
                    else:
                        self.pk_map[pk_key] = cursor

                # Commit the row into every column.
                for f in self.schema.fields:
                    if f.is_index_field:
                        continue
                    ft = f.field_type
                    name = f.name
                    if ft in DENSE_VECTOR_TYPES:
                        vec = parsed[name]
                        self.dense_host[name][cursor] = vec
                        self.dense_norms[name][cursor] = float(np.dot(vec, vec))
                    elif name in self.sparse_cols:
                        self.sparse_cols[name][cursor] = parsed[name]
                    elif ft == FieldType.GEO_POINT:
                        g = rec[name]
                        lat = min(max(float(g["latitude"]), -90.0), 90.0)
                        lon = min(max(float(g["longitude"]), -180.0), 180.0)
                        self.geo_cols[name][0][cursor] = lat
                        self.geo_cols[name][1][cursor] = lon
                    elif ft == FieldType.STRING:
                        self.varlen_cols[name][cursor] = str(rec[name])
                    elif ft == FieldType.JSON:
                        self.varlen_cols[name][cursor] = json.dumps(rec[name])
                    elif ft == FieldType.BOOL:
                        self.primitive_cols[name][cursor] = bool(rec[name])
                    elif ft in (FieldType.FLOAT, FieldType.DOUBLE):
                        self.primitive_cols[name][cursor] = float(rec[name])
                    else:
                        self.primitive_cols[name][cursor] = int(rec[name])
                cursor += 1

            # Auto-embedding of index fields over rows [start, cursor)
            # (reference table_segment_mvp.cpp:746-762).
            if embedding_service is not None:
                for index in self.schema.indices:
                    src_field = self.schema.fields[index.src_field_id].name
                    tgt = self.schema.fields[index.tgt_field_id]
                    docs = [self.varlen_cols[src_field][r]
                            for r in range(start, cursor)]
                    try:
                        embs = embedding_service.dense_embed_documents(
                            index.embedding_model_name, docs,
                            tgt.vector_dimension, headers or {},
                            index.dimensions > 0)
                    except VectorDBError as e:
                        logger.error("embedding service error: " + e.message)
                        return e.status
                    for j, r in enumerate(range(start, cursor)):
                        vec = np.asarray(embs[j], dtype=np.float32)
                        self.dense_host[tgt.name][r] = vec
                        self.dense_norms[tgt.name][r] = float(np.dot(vec, vec))

            self.record_number = cursor
            for pk_key, old_row, new_row in upserts:
                self.pk_map[pk_key] = new_row
                self.deleted[old_row] = True
            self.skip_sync_disk = False
            self.mutation_version += 1
            return Status(
                0, json.dumps({"inserted": n_new - skipped, "skipped": skipped}))

    # ------------------------------------------------------------------
    # Delete (reference table_segment_mvp.cpp:321-453).
    # ------------------------------------------------------------------

    def delete(self, pk_list: List[Any], filter_compiler, wal_id: int = -1) -> Status:
        with self.data_lock:
            self.wal_global_id = wal_id
            deleted_count = 0
            if pk_list:
                for pk in pk_list:
                    row = self.pk_to_id(pk)
                    if row is None or self.deleted[row]:
                        continue
                    if filter_compiler is not None:
                        ok = filter_compiler.mask(
                            row_ids=np.asarray([row], dtype=np.int64))[0]
                        if not ok:
                            continue
                    self.deleted[row] = True
                    fld = self.schema.field_map()[self.pk_field]
                    key = int(pk) if fld.field_type in INT_TYPES else str(pk)
                    self.pk_map.pop(key, None)
                    deleted_count += 1
            else:
                n = self.record_number
                alive = ~self.deleted[:n]
                if filter_compiler is not None:
                    mask = filter_compiler.mask(n_rows=n) & alive
                else:
                    mask = alive
                rows = np.nonzero(mask)[0]
                for row in rows:
                    self.deleted[row] = True
                if self.pk_field is not None and len(rows):
                    doomed = set(rows.tolist())
                    self.pk_map = {k: v for k, v in self.pk_map.items()
                                   if v not in doomed}
                deleted_count = len(rows)
            self.skip_sync_disk = False
            self.mutation_version += 1
            return Status(0, json.dumps({"deleted": int(deleted_count)}))

    # ------------------------------------------------------------------
    # InsertPrepare (reference table_segment_mvp.cpp:816-876).
    # ------------------------------------------------------------------

    def insert_prepare(self, pks: List[Any]) -> Dict[str, Any]:
        result: Dict[str, Any] = {
            "capacity": self.size_limit,
            "recordNumber": self.record_number,
        }
        if pks:
            masks: List[int] = []
            mask = 0xFFFFFFFF
            for i, pk in enumerate(pks):
                mod = i % 32
                if mod == 0:
                    mask = 0xFFFFFFFF
                if self.pk_to_id(pk) is not None:
                    mask -= 1 << mod
                if mod == 31:
                    masks.append(mask)
            if len(pks) % 32 != 0:
                masks.append(mask)
            result["masks"] = masks
        return result

    # ------------------------------------------------------------------
    # Device sync.
    # ------------------------------------------------------------------

    def device_view(self, field_name: str) -> DeviceVectorStore:
        """Device buffer for a dense field, synced to the current row count."""
        store = self.dense_device[field_name]
        with self.data_lock:
            store.sync(self.dense_host[field_name],
                       self.dense_norms[field_name], self.record_number)
        return store

    def valid_mask(self, n_padded: Optional[int] = None) -> np.ndarray:
        """Bool mask over [0, n_padded): alive rows below record_number."""
        n = self.record_number
        size = n_padded if n_padded is not None else n
        mask = np.zeros(size, dtype=bool)
        lim = min(n, size)
        mask[:lim] = ~self.deleted[:lim]
        return mask

    def count_alive(self) -> int:
        return int(self.record_number - np.count_nonzero(
            self.deleted[: self.record_number]))

    # ------------------------------------------------------------------
    # Snapshot persistence. Layout differs from the reference binary (this
    # store is column-major numpy, not a packed byte table); the artifact
    # role matches data_mvp.bin (reference table_segment_mvp.cpp:939-1010):
    # record count, deleted bitset, all columns, consumed WAL id, written
    # atomically via tmp+rename+fsync.
    # ------------------------------------------------------------------

    def save(self, path: str) -> Status:
        import io

        with self.data_lock:
            if self.skip_sync_disk:
                return Status.OK()
            n = self.record_number
            arrays: Dict[str, np.ndarray] = {
                "__meta__": np.frombuffer(json.dumps({
                    "version": self.SNAPSHOT_VERSION,
                    "record_number": n,
                    "first_record_id": self.first_record_id,
                    "wal_global_id": self.wal_global_id,
                    "size_limit": self.size_limit,
                }).encode("utf-8"), dtype=np.uint8),
                "__deleted__": np.packbits(self.deleted[:n]),
            }
            for name, col in self.primitive_cols.items():
                arrays["prim:" + name] = col[:n]
            for name, (lat, lon) in self.geo_cols.items():
                arrays["geolat:" + name] = lat[:n]
                arrays["geolon:" + name] = lon[:n]
            for name, col in self.varlen_cols.items():
                blob = json.dumps(col[:n]).encode("utf-8")
                arrays["varlen:" + name] = np.frombuffer(blob, dtype=np.uint8)
            for name, col in self.sparse_cols.items():
                idx_cat, val_cat, offs = [], [], [0]
                for v in col[:n]:
                    if v is not None:
                        idx_cat.append(v.indices)
                        val_cat.append(v.values)
                        offs.append(offs[-1] + len(v.indices))
                    else:
                        offs.append(offs[-1])
                arrays["spidx:" + name] = (np.concatenate(idx_cat)
                                           if idx_cat else np.zeros(0, np.int64))
                arrays["spval:" + name] = (np.concatenate(val_cat)
                                           if val_cat else np.zeros(0, np.float32))
                arrays["spoff:" + name] = np.asarray(offs, dtype=np.int64)
            for name, col in self.dense_host.items():
                arrays["dense:" + name] = col[:n]

            buf = io.BytesIO()
            np.savez(buf, **arrays)
            atomic_write_bytes(path, buf.getvalue())
            self.skip_sync_disk = True
        return Status.OK()

    @classmethod
    def load(cls, path: str, schema: TableSchema, capacity: int = 150000,
             vector_dtype: str = "bfloat16") -> "TableSegment":
        seg = cls(schema, capacity, vector_dtype)
        if not os.path.exists(path):
            return seg
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
            n = int(meta["record_number"])
            if n > seg.size_limit:
                raise VectorDBError(
                    DB_UNEXPECTED_ERROR,
                    f"Snapshot has {n} records which exceeds the table "
                    f"capacity {seg.size_limit}; reload with a larger "
                    "vectorScale parameter.")
            seg.record_number = n
            seg.first_record_id = int(meta.get("first_record_id", 0))
            seg.wal_global_id = int(meta.get("wal_global_id", -1))
            seg.deleted[:n] = np.unpackbits(z["__deleted__"],
                                            count=n).astype(bool)
            for name in seg.primitive_cols:
                seg.primitive_cols[name][:n] = z["prim:" + name]
            for name in seg.geo_cols:
                seg.geo_cols[name][0][:n] = z["geolat:" + name]
                seg.geo_cols[name][1][:n] = z["geolon:" + name]
            for name in seg.varlen_cols:
                vals = json.loads(bytes(z["varlen:" + name].tobytes())
                                  .decode("utf-8"))
                seg.varlen_cols[name][:n] = vals
            for name in seg.sparse_cols:
                idx = z["spidx:" + name]
                val = z["spval:" + name]
                off = z["spoff:" + name]
                col = seg.sparse_cols[name]
                for r in range(n):
                    a, b = int(off[r]), int(off[r + 1])
                    if b > a:
                        col[r] = SparseVector(idx[a:b], val[a:b])
            for name in seg.dense_host:
                seg.dense_host[name][:n] = z["dense:" + name]
                seg.dense_norms[name][:n] = np.einsum(
                    "nd,nd->n", seg.dense_host[name][:n],
                    seg.dense_host[name][:n]).astype(np.float32)
        # Rebuild PK map (reference load ctor rebuilds it, 177-236).
        if seg.pk_field is not None:
            fld = seg.schema.field_map()[seg.pk_field]
            if fld.field_type in INT_TYPES:
                col = seg.primitive_cols[seg.pk_field]
                for r in range(n):
                    if not seg.deleted[r]:
                        seg.pk_map[int(col[r])] = r
            else:
                col = seg.varlen_cols[seg.pk_field]
                for r in range(n):
                    if not seg.deleted[r]:
                        seg.pk_map[str(col[r])] = r
        seg.skip_sync_disk = True
        return seg
