"""Filter/facet expression language: tokenizer, shunting-yard, typed nodes.

A from-scratch port of the reference grammar
(/root/reference/engine/query/expr/expr.cpp:90-694 and expr_types.hpp:11-90):
SQL-ish comparison/arithmetic/logical expressions over table fields, string
constants in single quotes with backslash escapes, `IN (...)` string lists,
`LIKE` with % wildcards, the `NEARBY(geo_field, lat, lon, meters)` function,
and the `@distance` pseudo-attribute.

The output is a flat node array whose LAST element is the root (same layout as
the reference) — the vectorized evaluator compiles this array into numpy/jnp
column operations instead of interpreting it per row.
"""
from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from ..errors import (INVALID_EXPR, NOT_IMPLEMENTED_ERROR, Status,
                      VectorDBError)
from ..schema import FieldType


class NodeType(enum.Enum):
    Invalid = enum.auto()
    IntConst = enum.auto()
    StringConst = enum.auto()
    DoubleConst = enum.auto()
    BoolConst = enum.auto()
    Int1Attr = enum.auto()
    Int2Attr = enum.auto()
    Int4Attr = enum.auto()
    Int8Attr = enum.auto()
    StringAttr = enum.auto()
    DoubleAttr = enum.auto()
    FloatAttr = enum.auto()
    BoolAttr = enum.auto()
    GeoPointAttr = enum.auto()
    Add = enum.auto()
    Subtract = enum.auto()
    Multiply = enum.auto()
    Divide = enum.auto()
    Module = enum.auto()
    LT = enum.auto()
    LTE = enum.auto()
    EQ = enum.auto()
    GT = enum.auto()
    GTE = enum.auto()
    NE = enum.auto()
    AND = enum.auto()
    OR = enum.auto()
    NOT = enum.auto()
    FunctionCall = enum.auto()
    LIKE = enum.auto()
    SumAggregation = enum.auto()
    MinAggregation = enum.auto()
    MaxAggregation = enum.auto()
    CountAggregation = enum.auto()
    IN = enum.auto()
    ListString = enum.auto()


class ValueType(enum.Enum):
    STRING = enum.auto()
    INT = enum.auto()
    DOUBLE = enum.auto()
    BOOL = enum.auto()
    GEO_POINT = enum.auto()
    LIST_STRING = enum.auto()


OPERATOR_NODE_TYPES = {
    "+": NodeType.Add,
    "-": NodeType.Subtract,
    "*": NodeType.Multiply,
    "/": NodeType.Divide,
    "%": NodeType.Module,
    ">": NodeType.GT,
    ">=": NodeType.GTE,
    "=": NodeType.EQ,
    "<=": NodeType.LTE,
    "<": NodeType.LT,
    "<>": NodeType.NE,
    "AND": NodeType.AND,
    "OR": NodeType.OR,
    "NOT": NodeType.NOT,
    "LIKE": NodeType.LIKE,
}


@dataclass
class ExprNode:
    value_type: ValueType = ValueType.BOOL
    node_type: NodeType = NodeType.Invalid
    field_name: str = ""
    left: int = -1
    right: int = -1
    str_value: str = ""
    int_value: int = 0
    double_value: float = 0.0
    bool_value: bool = False
    function_name: str = ""
    arguments: List[int] = dc_field(default_factory=list)


_ARITH = set("+-*/%")
_COMPARE = set("><=")
_COMPARE_STRS = {">", ">=", "=", "<=", "<", "<>"}
_LOGICAL = {"AND", "OR", "NOT"}
_UNSUPPORTED = {"ALL", "ANY", "BETWEEN", "EXISTS", "SOME"}
_INT_RE = re.compile(r"^[-+]?\d+$")
_DOUBLE_RE = re.compile(r"^[-+]?\d+\.\d+(?:[eE][-+]?\d+)?$")


def _is_operator(tok: str) -> bool:
    u = tok.upper()
    return (tok in _ARITH or tok in _COMPARE_STRS or u in _LOGICAL
            or u == "LIKE" or u == "IN")


def _precedence(op: str) -> int:
    u = op.upper()
    if u in _LOGICAL:
        return 1
    if op in _COMPARE_STRS:
        return 2
    if u in ("LIKE", "IN"):
        return 3
    if op in ("+", "-"):
        return 4
    if op in ("*", "/", "%"):
        return 5
    return 0


def tokenize(expression: str) -> List[str]:
    """FSM tokenizer (reference SplitTokens, expr.cpp:90-293)."""
    tokens: List[str] = []
    state = "start"
    cur = ""
    i = 0
    n = len(expression)
    last = n - 1
    while i < n:
        c = expression[i]
        if state == "start":
            if c.isspace():
                i += 1
            elif c.isdigit():
                state = "number"
            elif c.isalpha() or c == "_":
                state = "attribute"
            elif c in "()":
                tokens.append(c)
                i += 1
            elif c in _ARITH or c in _COMPARE:
                if c == "-" and i != last and expression[i + 1].isdigit():
                    # Unary minus when following an operator or '(' or at start.
                    if tokens and not _is_operator(tokens[-1]) and tokens[-1] != "(":
                        state = "operator"
                    else:
                        cur += c
                        i += 1
                        state = "number"
                else:
                    state = "operator"
            elif c == "'":
                state = "string"
                i += 1
            elif c in "&|^":
                raise VectorDBError(NOT_IMPLEMENTED_ERROR,
                                    "Bitwise operators are not supported yet.")
            elif c == "@":
                if expression[i:i + 9] == "@distance":
                    tokens.append("@distance")
                    i += 9
                else:
                    raise VectorDBError(INVALID_EXPR, "Filter expression is not valid.")
            else:
                raise VectorDBError(INVALID_EXPR, "Filter expression is not valid.")
        elif state in ("string", "inlist_string"):
            if c == "'":
                if i != last and cur and cur[-1] == "\\":
                    cur = cur[:-1] + c
                    i += 1
                else:
                    i += 1
                    tokens.append("'" + cur + "'")
                    cur = ""
                    state = "inlist" if state == "inlist_string" else "start"
            else:
                if i == last:
                    raise VectorDBError(INVALID_EXPR, "Missing terminating '.")
                cur += c
                i += 1
        elif state == "attribute":
            if c.isspace() or c == ")" or c in _ARITH or c in _COMPARE:
                up = cur.upper()
                tokens.append("LIKE" if up == "LIKE" else cur)
                state = "inlist" if up == "IN" else "start"
                if up == "IN":
                    tokens[-1] = "IN"
                cur = ""
            elif c.isalnum() or c == "_":
                cur += c
                i += 1
            elif c == "(":
                if cur.upper() == "IN":
                    tokens.append("IN")
                    tokens.append("(")
                    cur = ""
                    i += 1
                    state = "inlist"
                else:
                    # Function call: consume balanced parens into one token.
                    cur += c
                    i += 1
                    depth = 1
                    while i < n and depth > 0:
                        c = expression[i]
                        if c == "(":
                            depth += 1
                        elif c == ")":
                            depth -= 1
                        cur += c
                        i += 1
                    tokens.append(cur)
                    cur = ""
                    state = "start"
            else:
                raise VectorDBError(INVALID_EXPR, "Invalid name: " + cur + c)
        elif state == "inlist":
            if c == "'":
                state = "inlist_string"
                cur = ""
                i += 1
            elif c == "(":
                tokens.append("(")
                i += 1
            elif c == ")":
                tokens.append(")")
                i += 1
                state = "start"
            elif c.isspace() or c == ",":
                i += 1
            else:
                raise VectorDBError(INVALID_EXPR, "Filter expression is not valid.")
        elif state == "number":
            if c.isspace() or c == ")" or c in _ARITH or c in _COMPARE:
                if cur.count(".") > 1:
                    raise VectorDBError(INVALID_EXPR, cur + " is not a valid number.")
                tokens.append(cur)
                cur = ""
                if c.isspace():
                    i += 1
                state = "start"
            elif c.isdigit():
                cur += c
                i += 1
            elif c == "." and i != last and expression[i + 1].isdigit():
                cur += c
                i += 1
            else:
                raise VectorDBError(INVALID_EXPR, "Filter expression is not valid.")
        elif state == "operator":
            if c in _ARITH:
                if i != last and expression[i + 1] == "=":
                    raise VectorDBError(NOT_IMPLEMENTED_ERROR,
                                        "Compound operators are not supported yet.")
                tokens.append(c)
                i += 1
                state = "start"
            elif c in _COMPARE:
                cur += c
                if i != last and expression[i + 1] in _COMPARE:
                    i += 1
                else:
                    if cur in _COMPARE_STRS:
                        tokens.append(cur)
                        cur = ""
                        i += 1
                        state = "start"
                    else:
                        raise VectorDBError(
                            INVALID_EXPR, "'" + cur + "' is an invalid operator.")
            else:
                # Should not happen: operator state always sees arith/compare.
                raise VectorDBError(INVALID_EXPR, "Filter expression is not valid.")
    if cur:
        if state == "string":
            raise VectorDBError(INVALID_EXPR, "Missing terminating '.")
        tokens.append(cur)
    return tokens


def shunting_yard(tokens: List[str]) -> List[str]:
    """Infix -> postfix (reference ShuntingYard, expr.cpp:295-325)."""
    out: List[str] = []
    stack: List[str] = []
    for tok in tokens:
        if tok == "(":
            stack.append(tok)
        elif tok == ")":
            while stack and stack[-1] != "(":
                out.append(stack.pop())
            if stack:
                stack.pop()  # the '('
        elif _is_operator(tok):
            while stack and _precedence(stack[-1]) >= _precedence(tok):
                out.append(stack.pop())
            stack.append(tok)
        else:
            out.append(tok)
    while stack:
        out.append(stack.pop())
    return out


def _check_compatible(op: str, left: ValueType, right: ValueType) -> ValueType:
    """Type check and result type (reference CheckCompatible, expr.cpp:387-450)."""
    u = op.upper()
    if u in _LOGICAL:
        if left != ValueType.BOOL or right != ValueType.BOOL:
            raise VectorDBError(INVALID_EXPR, op + " statement is invalid.")
        return ValueType.BOOL
    if op in _COMPARE_STRS:
        if op not in ("=", "<>"):
            if ValueType.STRING in (left, right) or ValueType.BOOL in (left, right):
                raise VectorDBError(INVALID_EXPR, op + " statement is invalid.")
        else:
            if left != right:
                numeric = {ValueType.INT, ValueType.DOUBLE}
                if not (left in numeric and right in numeric):
                    raise VectorDBError(INVALID_EXPR, op + " statement is invalid.")
        return ValueType.BOOL
    if op in _ARITH:
        if ValueType.BOOL in (left, right):
            raise VectorDBError(
                INVALID_EXPR, "Boolean value is not compatible with " + op + " operation.")
        if op != "+":
            if ValueType.STRING in (left, right):
                raise VectorDBError(
                    INVALID_EXPR, "String value is not compatible with " + op + " operation.")
            return (ValueType.DOUBLE if ValueType.DOUBLE in (left, right)
                    else ValueType.INT)
        if left == ValueType.STRING and right == ValueType.STRING:
            return ValueType.STRING
        if ValueType.STRING in (left, right):
            raise VectorDBError(INVALID_EXPR, op + " statement is invalid.")
        return ValueType.DOUBLE if ValueType.DOUBLE in (left, right) else ValueType.INT
    if u == "LIKE":
        if left != ValueType.STRING or right != ValueType.STRING:
            raise VectorDBError(INVALID_EXPR, "LIKE statement is invalid.")
        return ValueType.BOOL
    raise VectorDBError(INVALID_EXPR, "Unknown operator " + op)


_ATTR_NODE_TYPES = {
    FieldType.INT1: (NodeType.Int1Attr, ValueType.INT),
    FieldType.INT2: (NodeType.Int2Attr, ValueType.INT),
    FieldType.INT4: (NodeType.Int4Attr, ValueType.INT),
    FieldType.INT8: (NodeType.Int8Attr, ValueType.INT),
    FieldType.DOUBLE: (NodeType.DoubleAttr, ValueType.DOUBLE),
    FieldType.FLOAT: (NodeType.FloatAttr, ValueType.DOUBLE),
    FieldType.BOOL: (NodeType.BoolAttr, ValueType.BOOL),
    FieldType.STRING: (NodeType.StringAttr, ValueType.STRING),
}


def _generate_nodes(postfix: List[str],
                    field_map: Dict[str, FieldType],
                    check_bool: bool) -> List[ExprNode]:
    """Postfix tokens -> flat typed node array, root last
    (reference GenerateNodes, expr.cpp:452-694)."""
    node_stack: List[ExprNode] = []
    node_list: List[ExprNode] = []

    for tok in postfix:
        up = tok.upper()
        if up in _UNSUPPORTED:
            raise VectorDBError(NOT_IMPLEMENTED_ERROR,
                                up + " is not supported yet.")
        if _is_operator(tok):
            if up == "NOT":
                if not node_stack:
                    raise VectorDBError(INVALID_EXPR, "Filter expression is invalid.")
                child = node_stack.pop()
                if child.value_type != ValueType.BOOL:
                    raise VectorDBError(INVALID_EXPR, "NOT statement is invalid.")
                node_list.append(child)
                node = ExprNode(node_type=NodeType.NOT, value_type=ValueType.BOOL,
                                left=len(node_list) - 1, right=-1)
                node_stack.append(node)
            elif up == "IN":
                if len(node_stack) < 2:
                    raise VectorDBError(INVALID_EXPR,
                                        "Not enough operands for IN operator.")
                in_node = ExprNode(node_type=NodeType.IN, value_type=ValueType.BOOL)
                while node_stack and node_stack[-1].node_type != NodeType.StringAttr:
                    element = node_stack.pop()
                    in_node.arguments.append(len(node_list))
                    node_list.append(element)
                if not node_stack:
                    raise VectorDBError(
                        INVALID_EXPR, "IN operation is only supported for string attributes.")
                attr = node_stack.pop()
                if attr.value_type != ValueType.STRING:
                    raise VectorDBError(
                        INVALID_EXPR, "IN operation is only supported for string attributes.")
                in_node.arguments.append(len(node_list))
                node_list.append(attr)
                node_stack.append(in_node)
            else:
                if len(node_stack) < 2:
                    raise VectorDBError(INVALID_EXPR, "Filter expression is invalid.")
                right = node_stack.pop()
                left = node_stack.pop()
                vt = _check_compatible(tok, left.value_type, right.value_type)
                node_list.append(left)
                node_list.append(right)
                node = ExprNode(
                    node_type=OPERATOR_NODE_TYPES[up if up in _LOGICAL or up == "LIKE" else tok],
                    value_type=vt,
                    left=len(node_list) - 2,
                    right=len(node_list) - 1)
                node_stack.append(node)
        elif up.startswith("NEARBY("):
            # NEARBY(geo_attr, lat, lon, meters) (reference expr.cpp:532-608)
            args_str = tok[7:-1]
            args = [a.strip() for a in args_str.split(",")]
            if len(args) != 4:
                raise VectorDBError(INVALID_EXPR,
                                    "Wrong number of arguments in NEARBY function.")
            geo_attr, lat_s, lon_s, dist_s = args
            if geo_attr not in field_map:
                raise VectorDBError(
                    INVALID_EXPR,
                    "Invalid filter expression: field name '" + geo_attr + "' not found.")
            if field_map[geo_attr] != FieldType.GEO_POINT:
                raise VectorDBError(
                    INVALID_EXPR, "Type of field '" + geo_attr + "' is not a GEO_POINT.")
            for idx, a in enumerate((lat_s, lon_s, dist_s)):
                if not (_INT_RE.match(a) or _DOUBLE_RE.match(a)):
                    raise VectorDBError(
                        INVALID_EXPR,
                        "Invalid filter expression: argument %d is not a valid number."
                        % (idx + 2))
            lat, lon, dist = float(lat_s), float(lon_s), float(dist_s)
            if not -90 <= lat <= 90:
                raise VectorDBError(
                    INVALID_EXPR,
                    "Invalid filter expression: latitude should be in the range of [-90, 90].")
            if not -180 <= lon <= 180:
                raise VectorDBError(
                    INVALID_EXPR,
                    "Invalid filter expression: longitude should be in the range of [-180, 180].")
            node_list.append(ExprNode(node_type=NodeType.GeoPointAttr,
                                      value_type=ValueType.GEO_POINT,
                                      field_name=geo_attr))
            node_list.append(ExprNode(node_type=NodeType.DoubleConst,
                                      value_type=ValueType.DOUBLE, double_value=lat))
            node_list.append(ExprNode(node_type=NodeType.DoubleConst,
                                      value_type=ValueType.DOUBLE, double_value=lon))
            node_list.append(ExprNode(node_type=NodeType.DoubleConst,
                                      value_type=ValueType.DOUBLE, double_value=dist))
            node = ExprNode(node_type=NodeType.FunctionCall, value_type=ValueType.BOOL,
                            function_name="NEARBY",
                            arguments=[len(node_list) - 4, len(node_list) - 3,
                                       len(node_list) - 2, len(node_list) - 1])
            node_list.append(node)
            node_stack.append(node)
        else:
            node = ExprNode()
            if up in ("TRUE", "FALSE"):
                node.node_type = NodeType.BoolConst
                node.value_type = ValueType.BOOL
                node.bool_value = up == "TRUE"
            elif tok.startswith("'"):
                node.node_type = NodeType.StringConst
                node.value_type = ValueType.STRING
                node.str_value = tok[1:-1]
            elif _INT_RE.match(tok):
                node.node_type = NodeType.IntConst
                node.value_type = ValueType.INT
                node.int_value = int(tok)
            elif _DOUBLE_RE.match(tok):
                node.node_type = NodeType.DoubleConst
                node.value_type = ValueType.DOUBLE
                node.double_value = float(tok)
            elif tok == "@distance":
                node.field_name = tok
                node.node_type = NodeType.DoubleAttr
                node.value_type = ValueType.DOUBLE
            else:
                if tok not in field_map:
                    raise VectorDBError(
                        INVALID_EXPR,
                        "Invalid filter expression: field name '" + tok + "' not found.")
                node.field_name = tok
                ft = field_map[tok]
                if ft not in _ATTR_NODE_TYPES:
                    raise VectorDBError(
                        INVALID_EXPR,
                        "Type of field '" + tok + "' is not supported in filter expression.")
                node.node_type, node.value_type = _ATTR_NODE_TYPES[ft]
            node_stack.append(node)

    if len(node_stack) != 1:
        raise VectorDBError(INVALID_EXPR, "Filter expression is invalid.")
    node_list.append(node_stack.pop())
    if check_bool and node_list[-1].value_type != ValueType.BOOL:
        raise VectorDBError(INVALID_EXPR, "Filter should be a boolean expression,")
    return node_list


def parse_expr(expression: str,
               field_map: Dict[str, FieldType],
               check_bool: bool = True) -> List[ExprNode]:
    """Parse a filter/facet expression into a flat node array (root last).

    Empty expression -> empty list (no filter), matching reference
    ParseNodeFromStr (expr.cpp:696-726).
    """
    if expression == "":
        return []
    tokens = tokenize(expression)
    postfix = shunting_yard(tokens)
    return _generate_nodes(postfix, field_map, check_bool)


def expr_uses_distance(nodes: List[ExprNode]) -> bool:
    return any(n.field_name == "@distance" for n in nodes)
