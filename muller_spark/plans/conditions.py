"""Condition-list → Spark ``Column`` compiler.

Re-implements the semantics of the reference's vectorized predicate
engine (``muller/core/query/filter_vectorized.py:75-604`` in the
reference repo) on top of Catalyst expressions:

- A *condition* is a 3–5 tuple ``(tensor, op, value[, use_index[, "NOT"]])``
  with ops ``> < >= <= == != CONTAINS BETWEEN LIKE``
  (reference ``filter_vectorized.py:104,228-252``).
- *Connectors* are ``"AND"``/``"OR"`` applied strictly **left-to-right with
  no precedence** (reference ``filter_vectorized.py:600-604`` folds with
  ``np.intersect1d``/``union1d`` in list order) — so
  ``a AND b OR c`` compiles to ``(a AND b) OR c``, never ``a AND (b OR c)``.
- ``BETWEEN`` is inclusive on both ends (reference ``filter_vectorized.py:104``).
- ``LIKE`` is a *regex search* (Python ``re`` syntax, unanchored — reference
  ``filter_vectorized.py:437-465`` uses ``re.finditer``).  We compile to
  ``rlike`` (Java regex, also unanchored); the overwhelmingly common subset
  (char classes, literals, anchors, quantifiers) behaves identically.
  Patterns using Python-only syntax (``(?P<name>…)`` groups, ``(?P=name)``
  back-refs, ``(?#…)`` comments, bare ``\\Z``) — or any pattern Java's
  ``Pattern.compile`` rejects — fall back to an Arrow-batched pandas UDF
  running real Python ``re`` for exact parity (SURVEY §4 item 4).
- ``CONTAINS`` is tokenized full-text match: every token of the query must
  appear in the document's token set; ``"a||b"`` is an OR over such
  AND-of-token groups (reference ``filter_vectorized.py:228-233,329-334``).
- A 5th element ``"NOT"`` negates the condition
  (reference ``filter_vectorized.py:61-71``).

Everything stays JVM-side (no Python UDFs), so predicates participate in
whole-stage codegen and parquet pushdown — except the rare Python-only
LIKE patterns above, which take the pandas-UDF slow path by necessity.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

VALID_OPS = {">", "<", ">=", "<=", "==", "!=", "CONTAINS", "BETWEEN", "LIKE"}
VALID_CONNECTORS = {"AND", "OR"}

# Tokenization used by CONTAINS when no inverted index is attached: case-fold
# then split on runs of non-alphanumeric characters.  This is the scan-side
# analogue of the reference's tokenizer (jieba for CJK + whitespace for
# ASCII, reference ``inverted_index_vectorized.py:122-158``); for the ASCII
# corpora in the test tables the two agree.
TOKEN_SPLIT_REGEX = r"[^a-z0-9一-鿿]+"
# case-sensitive variant: uppercase letters are token CHARS, not
# separators — splitting un-lowered text on the lowercase-only class
# would consume 'ABC' entirely and mangle 'World' into 'orld'
TOKEN_SPLIT_REGEX_CS = r"[^a-zA-Z0-9一-鿿]+"


def tokenize_query(query: str, case_sensitive: bool = False) -> list[list[str]]:
    """Split a CONTAINS query into OR-groups of AND-terms.

    ``"hi||world"`` → ``[["hi"], ["world"]]``; ``"big cat"`` → ``[["big","cat"]]``.
    """
    import re

    groups = []
    for part in query.split("||"):
        if not case_sensitive:
            part = part.lower()
        split = TOKEN_SPLIT_REGEX_CS if case_sensitive else TOKEN_SPLIT_REGEX
        terms = [t for t in re.split(split, part) if t]
        if terms:
            groups.append(terms)
    return groups


def _token_array(col: Column, case_sensitive: bool = False) -> Column:
    if case_sensitive:
        return F.split(col, TOKEN_SPLIT_REGEX_CS)
    return F.split(F.lower(col), TOKEN_SPLIT_REGEX)


def contains_predicate(col: Column, query: str, case_sensitive: bool = False) -> Column:
    """Tokenized CONTAINS: OR over groups, AND over each group's terms."""
    tokens = _token_array(col, case_sensitive)
    groups = tokenize_query(query, case_sensitive)
    if not groups:
        return F.lit(False)
    group_preds = []
    for terms in groups:
        pred = F.array_contains(tokens, terms[0])
        for term in terms[1:]:
            pred = pred & F.array_contains(tokens, term)
        group_preds.append(pred)
    out = group_preds[0]
    for pred in group_preds[1:]:
        out = out | pred
    return out


_PY_ONLY_REGEX_TOKENS = ("(?P", "(?#", "\\Z")


def needs_python_regex(pattern: str) -> bool:
    """True when ``pattern`` must run under Python ``re`` (Java regex would
    reject it or silently change meaning)."""
    if any(tok in pattern for tok in _PY_ONLY_REGEX_TOKENS):
        return True
    # Eager Java-side validation when a live JVM is reachable.  Only a
    # rejection of the PATTERN flips us to the slow path — if the JVM
    # itself is unreachable (connect mode, no active session) we assume
    # rlike-safe, so an environment quirk can't silently de-optimize
    # every LIKE in the plan.
    compile_fn = None
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            compile_fn = spark._jvm.java.util.regex.Pattern.compile
    except Exception:
        return False
    if compile_fn is not None:
        try:
            compile_fn(pattern)
        except Exception:
            return True
    return False


def python_regex_predicate(col: Column, pattern: str) -> Column:
    """Unanchored Python-``re`` search as an Arrow-batched pandas UDF.

    Slow path relative to ``rlike`` (leaves codegen, ships strings over
    Arrow) — used only when :func:`needs_python_regex` says Java regex
    can't express the pattern.
    """
    import re as _re

    from pyspark.sql.functions import pandas_udf

    _re.compile(pattern)  # surface bad patterns on the driver, not executors

    def _search(s):
        import warnings

        with warnings.catch_warnings():
            # pandas warns that contains() ignores match groups — groups are
            # intentional here (named-group syntax is why we're on this path)
            warnings.simplefilter("ignore", UserWarning)
            return s.str.contains(pattern, regex=True, na=False)

    return pandas_udf(_search, "boolean")(col)


def compile_condition(condition: Sequence[Any]) -> Column:
    """Compile one condition tuple to a boolean Column."""
    if not 3 <= len(condition) <= 5:
        raise ValueError(f"condition must be a 3-5 tuple, got {condition!r}")
    tensor, op, value = condition[0], condition[1], condition[2]
    negate = len(condition) == 5 and str(condition[4]).upper() == "NOT"
    if len(condition) == 4 and str(condition[3]).upper() == "NOT":
        # a 4-tuple's position 4 is use_inverted_index (reference
        # tuple shape) — silently treating a misplaced 'NOT' as a
        # truthy index flag would return the COMPLEMENT of what the
        # user asked for; reject loudly with the correct shape
        raise ValueError(
            f"condition {condition!r}: 'NOT' belongs in position 5 "
            "(tensor, op, value, use_inverted_index, 'NOT') — position "
            "4 is the use_inverted_index flag"
        )
    if op not in VALID_OPS:
        raise ValueError(f"unsupported op {op!r}; valid: {sorted(VALID_OPS)}")
    col = F.col(tensor)
    if op == ">":
        pred = col > F.lit(value)
    elif op == "<":
        pred = col < F.lit(value)
    elif op == ">=":
        pred = col >= F.lit(value)
    elif op == "<=":
        pred = col <= F.lit(value)
    elif op == "==":
        pred = col == F.lit(value)
    elif op == "!=":
        pred = col != F.lit(value)
    elif op == "BETWEEN":
        lo, hi = value
        pred = col.between(F.lit(lo), F.lit(hi))
    elif op == "LIKE":
        if needs_python_regex(value):
            pred = python_regex_predicate(col, value)
        else:
            # coalesce(False): NULL text never matches — pinning the
            # SAME null semantics as the pandas path (na=False), so
            # NOT LIKE keeps null-text rows on BOTH regex engines
            # instead of the result set depending on which path the
            # pattern happens to route to
            pred = F.coalesce(col.rlike(value), F.lit(False))
    else:  # CONTAINS
        pred = contains_predicate(col, value)
    return ~pred if negate else pred


def compile_conditions(
    condition_list: Sequence[Sequence[Any]],
    connector_list: Sequence[str] | None = None,
) -> Column:
    """Fold conditions left-to-right with the given AND/OR connectors."""
    connector_list = list(connector_list or [])
    if len(connector_list) != max(0, len(condition_list) - 1):
        raise ValueError(
            f"need {max(0, len(condition_list) - 1)} connectors for "
            f"{len(condition_list)} conditions, got {len(connector_list)}"
        )
    if not condition_list:
        return F.lit(True)
    out = compile_condition(condition_list[0])
    for connector, condition in zip(connector_list, condition_list[1:]):
        upper = connector.upper()
        if upper not in VALID_CONNECTORS:
            raise ValueError(f"unsupported connector {connector!r}")
        nxt = compile_condition(condition)
        out = (out & nxt) if upper == "AND" else (out | nxt)
    return out
