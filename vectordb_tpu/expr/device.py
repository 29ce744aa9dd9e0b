"""Device-side filter mask compilation.

The reference evaluates filters per candidate row on the CPU
(/root/reference/engine/query/expr/expr_evaluator.cpp:37-282). The host
FilterCompiler (evaluator.py) already vectorizes that with numpy; this
module goes one step further for the flat-scan path: numeric/bool/geo
predicate trees are compiled to jnp ops over DEVICE-RESIDENT primitive
columns, so a filtered query performs no host mask evaluation over all rows
and — critically for tunneled deployments — no per-query host->device mask
upload.

Compilation is structure-keyed: the node tree's shape (types, fields,
operators) forms the cache key while constants are passed as a traced
vector, so `price > 10` and `price > 99` share one XLA executable.

Strings / LIKE / IN / @distance predicates are not device-compilable and
stay on the host path (is_device_compilable returns False).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

from .parser import ExprNode, NodeType, ValueType

_EARTH_RADIUS_KM = 6371.0

# Node types a device mask can contain.
_NUMERIC_ATTRS = (NodeType.Int1Attr, NodeType.Int2Attr, NodeType.Int4Attr,
                  NodeType.Int8Attr, NodeType.DoubleAttr, NodeType.FloatAttr)
_ARITH = (NodeType.Add, NodeType.Subtract, NodeType.Multiply,
          NodeType.Divide, NodeType.Module)
_CMP = (NodeType.EQ, NodeType.NE, NodeType.LT, NodeType.LTE, NodeType.GT,
        NodeType.GTE)
_LOGIC = (NodeType.AND, NodeType.OR, NodeType.NOT)
_CONSTS = (NodeType.IntConst, NodeType.DoubleConst, NodeType.BoolConst)


def is_device_compilable(nodes: List[ExprNode]) -> bool:
    """True when every node in the tree maps to jnp ops over primitive /
    geo columns (no strings, no @distance)."""
    if not nodes:
        return False
    for n in nodes:
        t = n.node_type
        if t in _CONSTS or t in _ARITH or t in _CMP or t in _LOGIC:
            continue
        if t in _NUMERIC_ATTRS:
            if n.field_name == "@distance":
                return False
            continue
        if t in (NodeType.BoolAttr, NodeType.GeoPointAttr):
            continue
        if t == NodeType.FunctionCall and n.function_name == "NEARBY":
            continue
        # Anything else (strings, IN, LIKE, aggregations) -> host path.
        return False
    return True


def _structure_key(nodes: List[ExprNode]) -> Tuple:
    """Everything about the tree except constant VALUES (enums by value so
    the key is hashable + stable)."""
    out = []
    for n in nodes:
        out.append((n.node_type.value, n.value_type.value,
                    n.field_name or "", int(n.left), int(n.right),
                    n.function_name or "", tuple(n.arguments or ())))
    return tuple(out)


def collect_constants(nodes: List[ExprNode]) -> np.ndarray:
    """Constant values in node order, as one f64 vector (traced jit arg)."""
    vals = []
    for n in nodes:
        if n.node_type == NodeType.IntConst:
            vals.append(float(n.int_value))
        elif n.node_type == NodeType.DoubleConst:
            vals.append(float(n.double_value))
        elif n.node_type == NodeType.BoolConst:
            vals.append(1.0 if n.bool_value else 0.0)
        else:
            vals.append(0.0)
    return np.asarray(vals, dtype=np.float32)


def collect_fields(nodes: List[ExprNode]) -> List[str]:
    """Field names referenced (order = first appearance). Geo fields appear
    once; their columns are passed as (lat, lon) pairs."""
    seen = []
    for n in nodes:
        if (n.node_type in _NUMERIC_ATTRS
                or n.node_type in (NodeType.BoolAttr, NodeType.GeoPointAttr)
                ) and n.field_name and n.field_name not in seen:
            seen.append(n.field_name)
    return seen


@functools.lru_cache(maxsize=256)
def _compiled_for_structure(key: Tuple, field_order: Tuple[str, ...],
                            nodes_repr: Tuple):
    """Build + jit the evaluator for one tree structure. `nodes_repr` is a
    tuple mirror of the nodes (hashable) from which the evaluator closure
    is reconstructed."""
    import jax
    import jax.numpy as jnp

    class _N:  # lightweight node view
        __slots__ = ("node_type", "value_type", "field_name", "left",
                     "right", "function_name", "arguments")

        def __init__(self, tup):
            (self.node_type, self.value_type, self.field_name, self.left,
             self.right, self.function_name, self.arguments) = tup

    nodes = [_N(t) for t in nodes_repr]
    f_idx = {name: i for i, name in enumerate(field_order)}

    def num_eval(i, consts, cols):
        n = nodes[i]
        t = NodeType(n.node_type)
        if t in _CONSTS:
            return consts[i]
        if t in _NUMERIC_ATTRS or t == NodeType.BoolAttr:
            return cols[f_idx[n.field_name]]
        if t in _ARITH:
            le = num_eval(n.left, consts, cols)
            r = num_eval(n.right, consts, cols)
            if t == NodeType.Add:
                return le + r
            if t == NodeType.Subtract:
                return le - r
            if t == NodeType.Multiply:
                return le * r
            if t == NodeType.Divide:
                return jnp.where(r != 0, le / r, 0.0)
            return jnp.where(r != 0,
                             le - jnp.trunc(le / r) * r, 0.0)  # fmod
        raise ValueError(f"non-numeric node {t}")

    def bool_eval(i, consts, cols):
        n = nodes[i]
        t = NodeType(n.node_type)
        if t == NodeType.BoolConst:
            return consts[i] != 0
        if t == NodeType.BoolAttr:
            return cols[f_idx[n.field_name]] != 0
        if t == NodeType.AND:
            return bool_eval(n.left, consts, cols) \
                & bool_eval(n.right, consts, cols)
        if t == NodeType.OR:
            return bool_eval(n.left, consts, cols) \
                | bool_eval(n.right, consts, cols)
        if t == NodeType.NOT:
            return ~bool_eval(n.left, consts, cols)
        if t in _CMP:
            lvt = ValueType(nodes[n.left].value_type)
            rvt = ValueType(nodes[n.right].value_type)
            if lvt == ValueType.BOOL and rvt == ValueType.BOOL:
                le = bool_eval(n.left, consts, cols)
                r = bool_eval(n.right, consts, cols)
                return le == r if t == NodeType.EQ else le != r
            le = num_eval(n.left, consts, cols)
            r = num_eval(n.right, consts, cols)
            if t == NodeType.EQ:
                return le == r
            if t == NodeType.NE:
                return le != r
            if t == NodeType.LT:
                return le < r
            if t == NodeType.LTE:
                return le <= r
            if t == NodeType.GT:
                return le > r
            return le >= r
        if (t == NodeType.FunctionCall):
            # NEARBY(geo_attr, lat, lon, radius_km): vectorized haversine.
            geo = nodes[n.arguments[0]]
            lat_c = consts[n.arguments[1]]
            lon_c = consts[n.arguments[2]]
            radius = consts[n.arguments[3]]
            lat, lon = cols[f_idx[geo.field_name]]
            la1, lo1 = jnp.radians(lat), jnp.radians(lon)
            la2, lo2 = jnp.radians(lat_c), jnp.radians(lon_c)
            a = (jnp.sin((la2 - la1) / 2.0) ** 2
                 + jnp.cos(la1) * jnp.cos(la2)
                 * jnp.sin((lo2 - lo1) / 2.0) ** 2)
            d = _EARTH_RADIUS_KM * 2.0 * jnp.arctan2(
                jnp.sqrt(a), jnp.sqrt(1.0 - a))
            return d <= radius
        raise ValueError(f"non-bool node {t}")

    @jax.jit
    def run(consts, valid_dev, *cols):
        return valid_dev & bool_eval(len(nodes) - 1, consts, cols)

    return run


class DeviceFilter:
    """Compiled device mask for one parsed filter over one segment.

    Cache instances per filter string (Table keeps a small LRU): the
    constants vector is device-put once at construction, so a repeated
    filter performs ZERO host->device transfers per query — columns are
    mutation-version-cached on the segment and the executable is
    structure-cached process-wide."""

    def __init__(self, nodes: List[ExprNode], segment):
        import jax

        self.nodes = nodes
        self.segment = segment
        self.field_order = tuple(collect_fields(nodes))
        # Host copy kept for mesh-sharded evaluation: the device copy is
        # committed to the default device, and mixing it with mesh-sharded
        # columns in one jit would raise a device mismatch.
        self.consts_host = collect_constants(nodes)
        self.consts = jax.device_put(self.consts_host)
        nodes_repr = _structure_key(nodes)
        self._fn = _compiled_for_structure(nodes_repr, self.field_order,
                                           nodes_repr)

    def mask_from_cols(self, valid_dev, cols, replicated_consts: bool = False):
        """Evaluate the compiled tree over caller-supplied device columns
        (shape-polymorphic: [capacity] single-chip or [S, cap_s] mesh-
        sharded — the tree is elementwise, so sharding propagates).
        `replicated_consts` passes the host constants so jit replicates
        them over the columns' mesh instead of using the committed
        single-device copy."""
        consts = self.consts_host if replicated_consts else self.consts
        return self._fn(consts, valid_dev, *cols)

    def match_count(self, mask_dev) -> int:
        """Rows passing (validity & filter), counted ON DEVICE from a
        composed mask — one scalar d2h per (segment version, mask layout),
        cached. Drives selectivity-aware beam widening: the filtered
        rank-k neighbor sits near global rank k/selectivity, so the graph
        search must explore proportionally deeper (the reference has no
        equivalent — its post-filter just returns fewer rows,
        vec_search_executor.cpp:906-927)."""
        import jax.numpy as jnp

        key = (self.segment.mutation_version, tuple(mask_dev.shape))
        hit = getattr(self, "_count_cache", None)
        if hit is not None and hit[0] == key:
            return hit[1]
        cnt = int(jnp.sum(mask_dev))
        self._count_cache = (key, cnt)
        return cnt

    def mask(self, valid_dev, capacity: int):
        """valid_dev: [capacity] bool device array (pure validity). Returns
        [capacity] bool device mask = valid & filter, or None when a
        referenced column can't live on device exactly (host fallback)."""
        cols = []
        for name in self.field_order:
            c = self.segment.device_column(name, capacity)
            if c is None:
                return None
            cols.append(c)
        return self.mask_from_cols(valid_dev, cols)
