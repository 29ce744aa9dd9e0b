"""Vectorized filter/expression evaluation over columnar segments.

The reference interprets the expression tree per candidate row
(/root/reference/engine/query/expr/expr_evaluator.cpp:37-282). Here the same
node array is evaluated as whole-column numpy operations, producing a boolean
mask (or numeric/str arrays for facets) over either all rows or a candidate
id subset — one vectorized pass instead of a per-row recursive interpreter.

The `@distance` pseudo-attribute (vec_search_executor.cpp:906-927 semantics)
is supported by passing the candidate distances array.
"""
from __future__ import annotations

import math
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..errors import INVALID_EXPR, VectorDBError
from .parser import ExprNode, NodeType, ValueType

_EARTH_RADIUS_KM = 6371.0


def like_to_regex(pattern: str) -> "re.Pattern":
    """SQL LIKE -> regex: % -> .*, _ -> . (reference expr_evaluator.cpp:15-35)."""
    escaped = re.escape(pattern)
    # re.escape escapes % and _ on some versions only; normalize both cases.
    escaped = escaped.replace(r"\%", "%").replace(r"\_", "_")
    regex = escaped.replace("%", ".*").replace("_", ".")
    return re.compile("^" + regex + "$", re.DOTALL)


def haversine_km(lat1, lon1, lat2, lon2):
    """Vectorized haversine distance in km (reference geoindex.cpp:41-59)."""
    lat1, lon1 = np.radians(lat1), np.radians(lon1)
    lat2, lon2 = np.radians(lat2), np.radians(lon2)
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return _EARTH_RADIUS_KM * 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))


class FilterCompiler:
    """Evaluate a parsed node array against a columnar segment.

    `columns` is a callable: field_name -> numpy array (for GEO_POINT a
    (lat, lon) pair of arrays; for STRING/JSON an object-dtype array).
    """

    def __init__(self, nodes: List[ExprNode], columns):
        self.nodes = nodes
        self.columns = columns

    # ----- public API ---------------------------------------------------

    def mask(self, row_ids: Optional[np.ndarray] = None,
             distances: Optional[np.ndarray] = None,
             n_rows: Optional[int] = None) -> np.ndarray:
        """Boolean mask for the root node over `row_ids` (or rows [0, n))."""
        if not self.nodes:
            size = len(row_ids) if row_ids is not None else int(n_rows or 0)
            return np.ones(size, dtype=bool)
        rows = self._rows(row_ids, n_rows)
        return np.asarray(
            self._bool_eval(len(self.nodes) - 1, rows, distances), dtype=bool)

    def numeric(self, row_ids: Optional[np.ndarray] = None,
                distances: Optional[np.ndarray] = None,
                n_rows: Optional[int] = None,
                node_index: Optional[int] = None) -> np.ndarray:
        rows = self._rows(row_ids, n_rows)
        idx = len(self.nodes) - 1 if node_index is None else node_index
        return np.asarray(self._num_eval(idx, rows, distances))

    def strings(self, row_ids: Optional[np.ndarray] = None,
                n_rows: Optional[int] = None,
                node_index: Optional[int] = None) -> np.ndarray:
        rows = self._rows(row_ids, n_rows)
        idx = len(self.nodes) - 1 if node_index is None else node_index
        return np.asarray(self._str_eval(idx, rows), dtype=object)

    def uses_distance(self) -> bool:
        return any(n.field_name == "@distance" for n in self.nodes)

    @property
    def root(self) -> ExprNode:
        return self.nodes[-1]

    # ----- helpers ------------------------------------------------------

    def _rows(self, row_ids, n_rows) -> np.ndarray:
        if row_ids is not None:
            return np.asarray(row_ids, dtype=np.int64)
        return np.arange(int(n_rows or 0), dtype=np.int64)

    def _num_eval(self, idx: int, rows: np.ndarray, distances):
        node = self.nodes[idx]
        t = node.node_type
        if t == NodeType.IntConst:
            return np.full(len(rows), node.int_value, dtype=np.int64)
        if t == NodeType.DoubleConst:
            return np.full(len(rows), node.double_value, dtype=np.float64)
        if t in (NodeType.Int1Attr, NodeType.Int2Attr, NodeType.Int4Attr,
                 NodeType.Int8Attr):
            return self.columns(node.field_name)[rows].astype(np.int64)
        if t in (NodeType.DoubleAttr, NodeType.FloatAttr):
            if node.field_name == "@distance":
                if distances is None:
                    return np.zeros(len(rows), dtype=np.float64)
                return np.asarray(distances, dtype=np.float64)
            return self.columns(node.field_name)[rows].astype(np.float64)
        if t in (NodeType.Add, NodeType.Subtract, NodeType.Multiply,
                 NodeType.Divide, NodeType.Module):
            left = self._num_eval(node.left, rows, distances)
            right = self._num_eval(node.right, rows, distances)
            if t == NodeType.Add:
                return left + right
            if t == NodeType.Subtract:
                return left - right
            if t == NodeType.Multiply:
                return left * right
            if t == NodeType.Divide:
                with np.errstate(divide="ignore", invalid="ignore"):
                    return np.where(right != 0, left / right, 0.0)
            # Module: C++ fmod/% semantics (truncation toward zero).
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(right != 0, np.fmod(left, right), 0)
            return out
        if t == NodeType.BoolConst:
            return np.full(len(rows), float(node.bool_value))
        if t == NodeType.BoolAttr:
            return self.columns(node.field_name)[rows].astype(np.float64)
        raise VectorDBError(INVALID_EXPR, f"Cannot evaluate node {t} numerically.")

    def _str_eval(self, idx: int, rows: np.ndarray):
        node = self.nodes[idx]
        t = node.node_type
        if t == NodeType.StringConst:
            return np.full(len(rows), node.str_value, dtype=object)
        if t == NodeType.StringAttr:
            return self.columns(node.field_name)[rows]
        if t == NodeType.Add:
            left = self._str_eval(node.left, rows)
            right = self._str_eval(node.right, rows)
            return np.asarray([l + r for l, r in zip(left, right)], dtype=object)
        raise VectorDBError(INVALID_EXPR, f"Cannot evaluate node {t} as string.")

    def _bool_eval(self, idx: int, rows: np.ndarray, distances):
        node = self.nodes[idx]
        t = node.node_type
        if t == NodeType.BoolConst:
            return np.full(len(rows), node.bool_value, dtype=bool)
        if t == NodeType.BoolAttr:
            return self.columns(node.field_name)[rows].astype(bool)
        if t == NodeType.AND:
            return (self._bool_eval(node.left, rows, distances)
                    & self._bool_eval(node.right, rows, distances))
        if t == NodeType.OR:
            return (self._bool_eval(node.left, rows, distances)
                    | self._bool_eval(node.right, rows, distances))
        if t == NodeType.NOT:
            return ~self._bool_eval(node.left, rows, distances)
        if t in (NodeType.EQ, NodeType.NE, NodeType.LT, NodeType.LTE,
                 NodeType.GT, NodeType.GTE):
            lvt = self.nodes[node.left].value_type
            rvt = self.nodes[node.right].value_type
            if lvt == ValueType.STRING and rvt == ValueType.STRING:
                left = self._str_eval(node.left, rows)
                right = self._str_eval(node.right, rows)
                eq = np.asarray([l == r for l, r in zip(left, right)], dtype=bool)
                if t == NodeType.EQ:
                    return eq
                if t == NodeType.NE:
                    return ~eq
                raise VectorDBError(INVALID_EXPR, "Invalid string comparison.")
            if lvt == ValueType.BOOL and rvt == ValueType.BOOL:
                left = self._bool_eval(node.left, rows, distances)
                right = self._bool_eval(node.right, rows, distances)
                if t == NodeType.EQ:
                    return left == right
                if t == NodeType.NE:
                    return left != right
                raise VectorDBError(INVALID_EXPR, "Invalid bool comparison.")
            left = self._num_eval(node.left, rows, distances)
            right = self._num_eval(node.right, rows, distances)
            if t == NodeType.EQ:
                return left == right
            if t == NodeType.NE:
                return left != right
            if t == NodeType.LT:
                return left < right
            if t == NodeType.LTE:
                return left <= right
            if t == NodeType.GT:
                return left > right
            return left >= right
        if t == NodeType.LIKE:
            left = self._str_eval(node.left, rows)
            pattern_node = self.nodes[node.right]
            if pattern_node.node_type != NodeType.StringConst:
                raise VectorDBError(INVALID_EXPR,
                                    "LIKE pattern must be a string constant.")
            rx = like_to_regex(pattern_node.str_value)
            return np.asarray([bool(rx.match(s)) for s in left], dtype=bool)
        if t == NodeType.IN:
            # arguments: [elem0, elem1, ..., attr] (attr last;
            # reference expr.cpp:483-509)
            attr_idx = node.arguments[-1]
            values = {self.nodes[i].str_value for i in node.arguments[:-1]}
            col = self._str_eval(attr_idx, rows)
            return np.asarray([s in values for s in col], dtype=bool)
        if t == NodeType.FunctionCall and node.function_name == "NEARBY":
            geo_node = self.nodes[node.arguments[0]]
            lat_c = self.nodes[node.arguments[1]].double_value
            lon_c = self.nodes[node.arguments[2]].double_value
            radius = self.nodes[node.arguments[3]].double_value
            lat_col, lon_col = self.columns(geo_node.field_name)
            d = haversine_km(lat_col[rows], lon_col[rows], lat_c, lon_c)
            return d <= radius
        raise VectorDBError(INVALID_EXPR, f"Cannot evaluate node {t} as bool.")


def find_nearby_uplift(nodes: List[ExprNode]) -> Optional[int]:
    """Find an AND-reachable NEARBY node index for geo-index uplift
    (reference UpliftingGeoIndex, expr_evaluator.cpp:260-282): a NEARBY call
    that is the root or reachable from the root purely through AND nodes can
    use the geo index to pre-restrict candidates."""
    if not nodes:
        return None

    def walk(idx: int) -> Optional[int]:
        node = nodes[idx]
        if node.node_type == NodeType.FunctionCall and node.function_name == "NEARBY":
            return idx
        if node.node_type == NodeType.AND:
            return walk(node.left) or walk(node.right)
        return None

    return walk(len(nodes) - 1)
