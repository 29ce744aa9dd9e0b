"""Facets: GROUP BY + SUM/MIN/MAX/COUNT aggregations.

Equivalent of the reference FacetExecutor
(/root/reference/engine/db/execution/aggregation.hpp:124-379), re-done as
vectorized numpy group-by over the columnar segment instead of a per-row
interpreter loop. Output JSON matches the reference shape (aggregation.hpp
:137-162): one object per group, keyed by the group expression string and the
aggregation expression strings; values are int when the aggregated expression
type-checks to INT, else double.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .errors import DB_UNEXPECTED_ERROR, Status, VectorDBError
from .expr.evaluator import FilterCompiler
from .expr.parser import NodeType, ValueType, parse_expr


def get_aggregation_type(expr: str) -> Tuple[Optional[NodeType], str]:
    """Recognize SUM(x)/MIN(x)/MAX(x)/COUNT(*) wrappers
    (reference getAggregationNodeType, db_server.cpp:362-383)."""
    up = expr.upper()
    if up.startswith("SUM(") and up.endswith(")"):
        return NodeType.SumAggregation, expr[4:-1]
    if up.startswith("MAX(") and up.endswith(")"):
        return NodeType.MaxAggregation, expr[4:-1]
    if up.startswith("MIN(") and up.endswith(")"):
        return NodeType.MinAggregation, expr[4:-1]
    if up.startswith("COUNT(") and up.endswith(")"):
        return NodeType.CountAggregation, "1"
    return None, ""


class FacetExecutor:
    def __init__(self, global_group_by: bool, group_by_expr: str,
                 group_nodes, agg_types: List[NodeType],
                 agg_exprs: List[str], agg_nodes: List):
        self.global_group_by = global_group_by
        self.group_by_expr = group_by_expr
        self.group_nodes = group_nodes
        self.agg_types = agg_types
        self.agg_exprs = agg_exprs
        self.agg_nodes = agg_nodes

    def run(self, segment, row_ids: Optional[np.ndarray],
            distances: Optional[np.ndarray]) -> List[Dict[str, Any]]:
        """Aggregate over `row_ids` (or the whole table when None) and project
        the grouped JSON objects."""
        if row_ids is None:
            rows = np.arange(segment.record_number, dtype=np.int64)
        else:
            rows = np.asarray(row_ids, dtype=np.int64)
        group_compiler = FilterCompiler(self.group_nodes, segment.column)
        gvt = self.group_nodes[-1].value_type

        if gvt == ValueType.STRING:
            keys = group_compiler.strings(row_ids=rows)
        elif gvt == ValueType.BOOL:
            keys = group_compiler.mask(row_ids=rows, distances=distances)
        else:
            keys = group_compiler.numeric(row_ids=rows, distances=distances)
            if gvt == ValueType.INT:
                keys = keys.astype(np.int64)

        uniq, inverse = np.unique(keys, return_inverse=True)
        n_groups = len(uniq)
        results: List[Dict[str, Any]] = [dict() for _ in range(n_groups)]
        if not self.global_group_by:
            for g in range(n_groups):
                key = uniq[g]
                if gvt == ValueType.INT:
                    results[g][self.group_by_expr] = int(key)
                elif gvt == ValueType.DOUBLE:
                    results[g][self.group_by_expr] = float(key)
                elif gvt == ValueType.BOOL:
                    results[g][self.group_by_expr] = bool(key)
                else:
                    results[g][self.group_by_expr] = str(key)

        for agg_type, agg_expr, nodes in zip(self.agg_types, self.agg_exprs,
                                             self.agg_nodes):
            compiler = FilterCompiler(nodes, segment.column)
            avt = nodes[-1].value_type
            vals = compiler.numeric(row_ids=rows, distances=distances)
            if agg_type == NodeType.CountAggregation:
                out = np.bincount(inverse, minlength=n_groups)
                is_int = True
            elif agg_type == NodeType.SumAggregation:
                out = np.bincount(inverse, weights=vals.astype(np.float64),
                                  minlength=n_groups)
                is_int = avt == ValueType.INT
            elif agg_type == NodeType.MinAggregation:
                out = np.full(n_groups, np.inf)
                np.minimum.at(out, inverse, vals.astype(np.float64))
                is_int = avt == ValueType.INT
            else:  # Max
                out = np.full(n_groups, -np.inf)
                np.maximum.at(out, inverse, vals.astype(np.float64))
                is_int = avt == ValueType.INT
            for g in range(n_groups):
                results[g][agg_expr] = (int(out[g]) if is_int
                                        else float(out[g]))
        return results


def preprocess_facets(facets_config: List[Dict[str, Any]],
                      field_type_map) -> List[FacetExecutor]:
    """Validate + compile facet configs (reference preprocessFacets,
    db_server.cpp:384-456). Raises VectorDBError on invalid configs."""
    executors: List[FacetExecutor] = []
    for facet in facets_config or []:
        group_cfg = facet.get("group", [])
        global_group = False
        if len(group_cfg) == 0:
            global_group = True
            group_expr = "1"
        elif len(group_cfg) > 1:
            raise VectorDBError(
                DB_UNEXPECTED_ERROR,
                "Multi-expression group is not supported yet: "
                + str(group_cfg))
        else:
            group_expr = str(group_cfg[0])
        group_nodes = parse_expr(group_expr, field_type_map, check_bool=False)
        gvt = group_nodes[-1].value_type
        if gvt not in (ValueType.INT, ValueType.DOUBLE, ValueType.STRING,
                       ValueType.BOOL):
            raise VectorDBError(
                DB_UNEXPECTED_ERROR,
                "Group by expression must be int, double, bool, or string.")
        agg_cfg = facet.get("aggregate", [])
        if len(agg_cfg) == 0:
            raise VectorDBError(DB_UNEXPECTED_ERROR,
                                "Aggregation is not specified.")
        agg_types, agg_exprs, agg_nodes = [], [], []
        for agg_expr in agg_cfg:
            agg_type, inner = get_aggregation_type(str(agg_expr))
            if agg_type is None:
                raise VectorDBError(DB_UNEXPECTED_ERROR,
                                    "Invalid aggregation expression: "
                                    + str(agg_expr))
            agg_types.append(agg_type)
            agg_exprs.append(str(agg_expr))
            agg_nodes.append(parse_expr(inner, field_type_map,
                                        check_bool=False))
        executors.append(FacetExecutor(global_group, group_expr, group_nodes,
                                       agg_types, agg_exprs, agg_nodes))
    return executors
