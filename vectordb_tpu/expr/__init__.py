from .parser import parse_expr, ExprNode, NodeType, ValueType
from .evaluator import FilterCompiler

__all__ = ["parse_expr", "ExprNode", "NodeType", "ValueType", "FilterCompiler"]
