"""Catalog: persistent database -> table schema registry.

Equivalent of the reference's Meta / BasicMetaImpl
(/root/reference/engine/db/catalog/basic_meta_impl.cpp): the catalog is a JSON
file named `catalog` in the database path, written atomically and only by the
leader; schema validation follows ValidateSchema (basic_meta_impl.cpp:315-460)
including the hidden index vector field insertion for content indices.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional

from .errors import DB_UNEXPECTED_ERROR, Status, VectorDBError
from .schema import (DatabaseSchema, FieldSchema, FieldType, MetricType,
                     TableSchema)
from .utils import atomic_write_text, is_valid_name

_NAME_RULE = ("should start with a letter or '_' and can contain only "
              "letters, digits, and underscores.")


def validate_schema(schema: TableSchema, embedding_models: List) -> Status:
    if not is_valid_name(schema.name):
        return Status(DB_UNEXPECTED_ERROR, "Table name " + _NAME_RULE)
    seen = set()
    has_vector = False
    has_pk = False
    for f in schema.fields:
        if not is_valid_name(f.name):
            return Status(DB_UNEXPECTED_ERROR,
                          f.name + ": Field name " + _NAME_RULE)
        if f.name in seen:
            return Status(DB_UNEXPECTED_ERROR,
                          "Field names can not be duplicated.")
        seen.add(f.name)
        if f.field_type == FieldType.UNKNOWN:
            return Status(DB_UNEXPECTED_ERROR,
                          "Type of " + f.name + " is not valid.")
        if f.is_vector():
            has_vector = True
            if f.vector_dimension <= 0:
                return Status(DB_UNEXPECTED_ERROR,
                              "Vector dimension must be positive.")
            if f.metric_type == MetricType.UNKNOWN:
                return Status(DB_UNEXPECTED_ERROR,
                              "Metric type of " + f.name + " is not valid.")
        if f.is_primary_key:
            if has_pk:
                return Status(DB_UNEXPECTED_ERROR,
                              "Cannot have more than 1 primary key fields.")
            if f.field_type not in (FieldType.INT1, FieldType.INT2,
                                    FieldType.INT4, FieldType.INT8,
                                    FieldType.STRING):
                return Status(
                    DB_UNEXPECTED_ERROR,
                    "Primary key can only be set to a field with type TINYINT,"
                    " SMALLINT, INT, BIGINT, or STRING.")
            has_pk = True

    # Content indices become hidden COSINE vector fields
    # (basic_meta_impl.cpp:388-459).
    for index in schema.indices:
        if not is_valid_name(index.name):
            return Status(DB_UNEXPECTED_ERROR, "Index name " + _NAME_RULE)
        src = None
        for i, f in enumerate(schema.fields):
            if f.name == index.field_name:
                if f.field_type != FieldType.STRING:
                    return Status(DB_UNEXPECTED_ERROR,
                                  "Only string fields can be indexed.")
                index.src_field_id = i
                src = f
                break
        if src is None:
            return Status(DB_UNEXPECTED_ERROR,
                          "Field name not found: " + index.field_name)
        if index.name in seen:
            return Status(DB_UNEXPECTED_ERROR,
                          "Index name cannot be the same as a field name.")
        seen.add(index.name)
        model = next((m for m in embedding_models
                      if m.model == index.embedding_model_name), None)
        if model is None:
            return Status(DB_UNEXPECTED_ERROR,
                          "Embedding model is not supported: "
                          + index.embedding_model_name)
        fs = FieldSchema(
            id=len(schema.fields), name=index.name, is_primary_key=False,
            is_index_field=True,
            field_type=(FieldType.VECTOR_FLOAT if model.dense
                        else FieldType.SPARSE_VECTOR_FLOAT),
            vector_dimension=model.dim, metric_type=MetricType.COSINE)
        index.tgt_field_id = fs.id
        if index.dimensions > 0:
            if not model.dimension_reduction:
                return Status(DB_UNEXPECTED_ERROR,
                              "Embedding model does not support dimension "
                              "reduction: " + index.embedding_model_name)
            if index.dimensions > model.dim:
                return Status(DB_UNEXPECTED_ERROR,
                              "The specified dimension is larger than the "
                              "embedding model's original dimension: "
                              + index.embedding_model_name)
            fs.vector_dimension = index.dimensions
        schema.fields.append(fs)
        has_vector = True

    if not has_vector:
        return Status(DB_UNEXPECTED_ERROR,
                      "At lease one vector field is required.")
    return Status.OK()


class Catalog:
    """In-memory DatabaseSchema map backed by per-db `catalog` JSON files."""

    def __init__(self):
        self.databases: Dict[str, DatabaseSchema] = {}
        self._lock = threading.Lock()
        self.is_leader = True

    def set_leader(self, leader: bool) -> None:
        self.is_leader = leader

    def catalog_file(self, db: DatabaseSchema) -> str:
        return os.path.join(db.path, "catalog")

    def load_database(self, db_name: str, db_path: str) -> DatabaseSchema:
        if not is_valid_name(db_name):
            raise VectorDBError(DB_UNEXPECTED_ERROR, "DB name " + _NAME_RULE)
        path = os.path.join(db_path, "catalog")
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as f:
                j = json.load(f)
            db = DatabaseSchema.from_json(j, name=db_name, path=db_path)
        else:
            db = DatabaseSchema(id=len(self.databases), name=db_name,
                                path=db_path)
        with self._lock:
            self.databases[db_name] = db
        return db

    def unload_database(self, db_name: str) -> None:
        with self._lock:
            self.databases.pop(db_name, None)

    def has_database(self, db_name: str) -> bool:
        return db_name in self.databases

    def get_database(self, db_name: str) -> Optional[DatabaseSchema]:
        return self.databases.get(db_name)

    def save(self, db_name: str, path: Optional[str] = None) -> Status:
        """Write the catalog JSON (to `path` when dumping elsewhere)."""
        db = self.databases.get(db_name)
        if db is None:
            return Status(DB_UNEXPECTED_ERROR, "DB not found: " + db_name)
        if not self.is_leader:
            return Status.OK()  # followers never write (leader-only guard)
        target_dir = path or db.path
        os.makedirs(target_dir, exist_ok=True)
        atomic_write_text(os.path.join(target_dir, "catalog"),
                          json.dumps(db.to_json()))
        return Status.OK()

    def create_table(self, db_name: str, schema: TableSchema,
                     embedding_models: Optional[List] = None) -> Status:
        with self._lock:
            db = self.databases.get(db_name)
            if db is None:
                return Status(DB_UNEXPECTED_ERROR, "DB not found: " + db_name)
            if any(t.name == schema.name for t in db.tables):
                return Status(DB_UNEXPECTED_ERROR,
                              "Table already exists: " + schema.name)
            status = validate_schema(schema, embedding_models or [])
            if not status.ok():
                return status
            schema.id = (max((t.id for t in db.tables), default=-1) + 1)
            db.tables.append(schema)
        return self.save(db_name)

    def drop_table(self, db_name: str, table_name: str) -> Status:
        with self._lock:
            db = self.databases.get(db_name)
            if db is None:
                return Status(DB_UNEXPECTED_ERROR, "DB not found: " + db_name)
            before = len(db.tables)
            db.tables = [t for t in db.tables if t.name != table_name]
            if len(db.tables) == before:
                return Status(DB_UNEXPECTED_ERROR,
                              "Table not found: " + table_name)
        return self.save(db_name)
