"""Expression language tests: tokenizer, parser, vectorized evaluator.

Mirrors the grammar of /root/reference/engine/query/expr/expr.cpp.
"""
import numpy as np
import pytest

from vectordb_tpu.errors import VectorDBError
from vectordb_tpu.expr.evaluator import FilterCompiler
from vectordb_tpu.expr.parser import (NodeType, ValueType, parse_expr,
                                      shunting_yard, tokenize)
from vectordb_tpu.schema import FieldType

FIELDS = {
    "ID": FieldType.INT4,
    "age": FieldType.INT4,
    "score": FieldType.DOUBLE,
    "name": FieldType.STRING,
    "active": FieldType.BOOL,
    "loc": FieldType.GEO_POINT,
}


def make_columns():
    data = {
        "ID": np.arange(10, dtype=np.int32),
        "age": np.array([20, 25, 30, 35, 40, 45, 50, 55, 60, 65],
                        dtype=np.int32),
        "score": np.linspace(0.0, 9.0, 10),
        "name": np.array(["alice", "bob", "carol", "dave", "eve", "frank",
                          "grace", "heidi", "ivan", "judy"], dtype=object),
        "active": np.array([True, False] * 5),
        "loc": (np.full(10, 37.0), np.full(10, -122.0)),
    }
    return lambda name: data[name]


def evaluate(expr, distances=None):
    nodes = parse_expr(expr, FIELDS)
    fc = FilterCompiler(nodes, make_columns())
    return fc.mask(n_rows=10, distances=distances)


class TestTokenizer:
    def test_simple(self):
        assert tokenize("ID < 5") == ["ID", "<", "5"]

    def test_compound(self):
        assert tokenize("age >= 30 AND score < 5.5") == [
            "age", ">=", "30", "AND", "score", "<", "5.5"]

    def test_string_escape(self):
        assert tokenize(r"name = 'a\'b'") == ["name", "=", "'a'b'"]

    def test_in_list(self):
        toks = tokenize("name IN ('a', 'b')")
        assert toks == ["name", "IN", "(", "'a'", "'b'", ")"]

    def test_unterminated_string(self):
        with pytest.raises(VectorDBError):
            tokenize("name = 'oops")

    def test_bitwise_rejected(self):
        with pytest.raises(VectorDBError):
            tokenize("age & 1")

    def test_negative_number(self):
        assert tokenize("age > -5") == ["age", ">", "-5"]

    def test_distance_pseudo_attr(self):
        assert tokenize("@distance < 0.5") == ["@distance", "<", "0.5"]


class TestParser:
    def test_root_is_last(self):
        nodes = parse_expr("ID < 5", FIELDS)
        assert nodes[-1].node_type == NodeType.LT
        assert nodes[-1].value_type == ValueType.BOOL

    def test_unknown_field(self):
        with pytest.raises(VectorDBError):
            parse_expr("bogus < 5", FIELDS)

    def test_type_mismatch(self):
        with pytest.raises(VectorDBError):
            parse_expr("name < 5", FIELDS)

    def test_non_bool_root_rejected(self):
        with pytest.raises(VectorDBError):
            parse_expr("age + 1", FIELDS)

    def test_non_bool_allowed_for_facets(self):
        nodes = parse_expr("age + 1", FIELDS, check_bool=False)
        assert nodes[-1].value_type == ValueType.INT

    def test_empty_is_no_filter(self):
        assert parse_expr("", FIELDS) == []

    def test_nearby_validation(self):
        nodes = parse_expr("NEARBY(loc, 37.0, -122.0, 100)", FIELDS)
        assert nodes[-1].node_type == NodeType.FunctionCall
        with pytest.raises(VectorDBError):
            parse_expr("NEARBY(loc, 95.0, -122.0, 100)", FIELDS)  # bad lat
        with pytest.raises(VectorDBError):
            parse_expr("NEARBY(age, 37.0, -122.0, 100)", FIELDS)  # not geo


class TestEvaluator:
    def test_comparison(self):
        np.testing.assert_array_equal(
            evaluate("ID < 5"), np.arange(10) < 5)

    def test_arithmetic(self):
        np.testing.assert_array_equal(
            evaluate("age * 2 - 10 > 60"),
            np.array([20, 25, 30, 35, 40, 45, 50, 55, 60, 65]) * 2 - 10 > 60)

    def test_precedence(self):
        # AND and OR share precedence and associate left (reference
        # getPrecedence, expr.cpp:75-88): a OR b AND c == (a OR b) AND c.
        got = evaluate("ID < 3 OR age > 60 AND active = FALSE")
        ids = np.arange(10)
        ages = np.array([20, 25, 30, 35, 40, 45, 50, 55, 60, 65])
        active = np.array([True, False] * 5)
        np.testing.assert_array_equal(got, ((ids < 3) | (ages > 60)) & ~active)

    def test_parens_override(self):
        got = evaluate("ID < 3 OR (age > 60 AND active = FALSE)")
        ids = np.arange(10)
        ages = np.array([20, 25, 30, 35, 40, 45, 50, 55, 60, 65])
        active = np.array([True, False] * 5)
        np.testing.assert_array_equal(got, (ids < 3) | ((ages > 60) & ~active))

    def test_string_eq(self):
        got = evaluate("name = 'carol'")
        assert got.tolist() == [False, False, True] + [False] * 7

    def test_in(self):
        got = evaluate("name IN ('bob', 'judy')")
        assert got.tolist() == [False, True] + [False] * 7 + [True]

    def test_like(self):
        got = evaluate("name LIKE '%a%'")
        names = ["alice", "bob", "carol", "dave", "eve", "frank", "grace",
                 "heidi", "ivan", "judy"]
        np.testing.assert_array_equal(got, np.array(["a" in n for n in names]))

    def test_not(self):
        np.testing.assert_array_equal(evaluate("NOT active = TRUE"),
                                      np.array([False, True] * 5))

    def test_distance_filter(self):
        d = np.linspace(0, 0.9, 10)
        got = evaluate("@distance < 0.5", distances=d)
        np.testing.assert_array_equal(got, d < 0.5)

    def test_nearby(self):
        got = evaluate("NEARBY(loc, 37.0, -122.0, 1)")
        assert got.all()  # all points are at the center
        got = evaluate("NEARBY(loc, 40.0, -100.0, 1)")
        assert not got.any()

    def test_modulo(self):
        np.testing.assert_array_equal(evaluate("ID % 2 = 0"),
                                      np.arange(10) % 2 == 0)
