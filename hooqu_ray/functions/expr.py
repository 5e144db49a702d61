"""Predicate mini-language → vectorized pyarrow.compute evaluation.

The reference exposes arbitrary ``pandas.query``/``pandas.eval`` strings
through ``where=`` filters and ``Check.satisfies`` predicates
(``hooqu/analyzers/compliance.py:33-37``, ``hooqu/checks.py:341-375``).  All
expressions its API sugar and tests actually emit use a small surface:

    comparisons  < <= > >= == !=     (incl. chained a < b < c)
    boolean      and or not          (Kleene semantics on nulls)
    membership   x in [..] / .isin([...])
    null ops     .isna() .notna() .isnull() .notnull() .fillna(v)
    arithmetic   + - * / **          (/ is true division, as in pandas)
    backticks    `column name`
    literals     numbers, strings, True/False/None, [list] / (tuple)
    conditionals where(cond, a, b) = SQL CASE WHEN (null cond -> ELSE);
                 coalesce(a, b, ...) = SQL COALESCE (float NaN is null)
                 — ENGINE EXTENSIONS: not pandas.eval syntax, so they have
                 no pandas fallback (they compile or raise)

We compile that surface once on the driver into a picklable evaluator over
``pyarrow.Table`` blocks (zero Python-per-row work).  Anything outside the
surface raises ``ExprCompileError``; callers fall back to per-batch
``pandas.eval`` (`PandasPredicate`) for exact reference semantics.

Pinned reference quirks reproduced here:
- ``item != '6'`` on an int column: the reference CI (pandas 1.x + numexpr)
  coerces the numeric-looking string literal; its goldens depend on row 6
  being excluded (``tests/test_analyzers.py:57-65``).  We coerce numeric
  string literals when compared against numeric columns.
- ``.isna()`` treats float NaN like null (pandas has no NaN/null split).
- Comparisons with null evaluate to null, which counts as "no match" both in
  filters (dropped) and in Compliance sums (skipped) — same outcome as
  pandas' False.
"""

from __future__ import annotations

import ast
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class ExprCompileError(ValueError):
    pass


_BTICK_RE = re.compile(r"`([^`]*)`")

_NUMERIC_STR_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")

Evaluator = Callable[[pa.Table], Any]  # returns pa.Array / ChunkedArray / scalar


def _is_float_type(t: pa.DataType) -> bool:
    return pa.types.is_floating(t)


def _isna_array(arr) -> pa.Array:
    if _is_float_type(arr.type):
        return pc.is_null(arr, nan_is_null=True)
    return pc.is_null(arr)


def _fillna_array(arr, value):
    if _is_float_type(arr.type):
        mask = pc.is_null(arr, nan_is_null=True)
        return pc.if_else(mask, pa.scalar(float(value), type=arr.type), arr)
    return pc.fill_null(arr, value)


class _Node:
    """Compiled expression node; callable on a pa.Table."""

    __slots__ = ("fn", "is_column", "column")

    def __init__(self, fn: Evaluator, is_column: bool = False, column: Optional[str] = None):
        self.fn = fn
        self.is_column = is_column
        self.column = column

    def __call__(self, table: pa.Table):
        return self.fn(table)


def _col_node(name: str) -> _Node:
    def fn(table: pa.Table):
        col = table.column(name)
        # Single-chunk arrays keep kernels on the simple path.
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    return _Node(fn, is_column=True, column=name)


def _const_node(value: Any) -> _Node:
    return _Node(lambda table: value)


_TS_STR_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T].*)?$")


def _coerce_literal(value: Any, other_type: Optional[pa.DataType]) -> Any:
    """Numeric-string literal vs numeric column → coerce to number;
    ISO date/datetime string vs temporal column → coerce to a typed scalar
    (pandas-query semantics: ``ts > '2024-01-03'`` parses the literal, and
    a tz-naive literal against a tz-aware column is wall time in the
    column's zone).  Called at COMPILE time (c_Compare hoists constant
    operands), so the pandas import + parse run once per expression, not
    once per batch, and a rejection routes to the pandas fallback."""
    if (
        isinstance(value, str)
        and other_type is not None
        and (pa.types.is_integer(other_type) or pa.types.is_floating(other_type))
        and _NUMERIC_STR_RE.match(value)
    ):
        return float(value) if ("." in value or "e" in value.lower()) else int(value)
    if (
        isinstance(value, str)
        and other_type is not None
        and _TS_STR_RE.match(value)
        and (pa.types.is_timestamp(other_type) or pa.types.is_date(other_type))
    ):
        import pandas as pd

        try:
            ts = pd.Timestamp(value)
        except ValueError:
            return value
        if pa.types.is_date(other_type):
            return pa.scalar(ts.date(), type=other_type)
        if getattr(other_type, "tz", None) is not None and ts.tz is None:
            ts = ts.tz_localize(other_type.tz)
        if getattr(other_type, "tz", None) is None and ts.tz is not None:
            # pa.scalar would silently shift to UTC wall time here; pandas
            # RAISES on tz-aware vs tz-naive — defer to the pandas
            # fallback, which mirrors that raise exactly
            raise ExprCompileError(
                "tz-aware literal compared to a tz-naive timestamp column")
        return pa.scalar(ts, type=other_type)
    return value


_CMP_KERNELS = {
    ast.Gt: pc.greater,
    ast.GtE: pc.greater_equal,
    ast.Lt: pc.less,
    ast.LtE: pc.less_equal,
    ast.Eq: pc.equal,
    ast.NotEq: pc.not_equal,
}

_BIN_KERNELS = {
    ast.Add: pc.add,
    ast.Sub: pc.subtract,
    ast.Mult: pc.multiply,
    ast.Pow: pc.power,
}

# pandas `.str.<method>()` no-arg accessors → pyarrow string kernels.
# Semantics verified identical (incl. empty string and null propagation):
# Python str.isdigit('')==False == utf8_is_digit(''); trim_whitespace uses
# the same Unicode whitespace class as str.strip().
_STR_SIMPLE = {
    "len": pc.utf8_length,
    "lower": pc.utf8_lower,
    "upper": pc.utf8_upper,
    "strip": pc.utf8_trim_whitespace,
    "lstrip": pc.utf8_ltrim_whitespace,
    "rstrip": pc.utf8_rtrim_whitespace,
    "isdigit": pc.utf8_is_digit,
    "isalpha": pc.utf8_is_alpha,
    "isalnum": pc.utf8_is_alnum,
    "isspace": pc.utf8_is_space,
    "islower": pc.utf8_is_lower,
    "isupper": pc.utf8_is_upper,
    "istitle": pc.utf8_is_title,
}

# pandas `.dt.<field>` accessors → pyarrow temporal kernels.  Conventions
# line up: pc.day_of_week defaults to Monday=0 counting from zero (pandas
# dayofweek/weekday), day_of_year and quarter are 1-based on both sides.
_DT_FIELDS = {
    "year": pc.year,
    "month": pc.month,
    "day": pc.day,
    "hour": pc.hour,
    "minute": pc.minute,
    "second": pc.second,
    "microsecond": pc.microsecond,
    "dayofweek": pc.day_of_week,
    "day_of_week": pc.day_of_week,
    "weekday": pc.day_of_week,
    "dayofyear": pc.day_of_year,
    "day_of_year": pc.day_of_year,
    "quarter": pc.quarter,
}


class _Compiler(ast.NodeVisitor):
    def __init__(self, schema: Optional[pa.Schema], colmap: Dict[str, str]):
        self.schema = schema
        self.colmap = colmap  # sanitized identifier -> real column name
        self.columns: Set[str] = set()

    # -- helpers ---------------------------------------------------------
    def _resolve_column(self, ident: str) -> str:
        name = self.colmap.get(ident, ident)
        if self.schema is not None and name not in self.schema.names:
            raise ExprCompileError(f"name '{name}' is not defined (no such column)")
        self.columns.add(name)
        return name

    def _type_of(self, node: _Node) -> Optional[pa.DataType]:
        if node.is_column and self.schema is not None:
            return self.schema.field(node.column).type
        return None

    # -- dispatch --------------------------------------------------------
    def compile(self, node: ast.AST) -> _Node:
        method = "c_" + type(node).__name__
        fn = getattr(self, method, None)
        if fn is None:
            raise ExprCompileError(f"unsupported syntax: {type(node).__name__}")
        return fn(node)

    def c_Expression(self, node: ast.Expression) -> _Node:
        return self.compile(node.body)

    def c_Name(self, node: ast.Name) -> _Node:
        if node.id == "True":
            return _const_node(True)
        if node.id == "False":
            return _const_node(False)
        if node.id == "None":
            return _const_node(None)
        return _col_node(self._resolve_column(node.id))

    def c_Constant(self, node: ast.Constant) -> _Node:
        return _const_node(node.value)

    def c_List(self, node: ast.List) -> _Node:
        return _const_node([self._const_value(e) for e in node.elts])

    c_Tuple = c_List
    c_Set = c_List

    def _const_value(self, node: ast.AST) -> Any:
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub) and isinstance(
            node.operand, ast.Constant
        ):
            return -node.operand.value
        raise ExprCompileError("list literals must contain constants")

    def c_UnaryOp(self, node: ast.UnaryOp) -> _Node:
        operand = self.compile(node.operand)
        if isinstance(node.op, ast.Not):
            return _Node(lambda t: pc.invert(operand(t)))
        if isinstance(node.op, ast.USub):
            def neg(t, _op=operand):
                v = _op(t)
                if isinstance(v, (int, float)):
                    return -v
                return pc.negate(v)
            return _Node(neg)
        raise ExprCompileError(f"unsupported unary op {type(node.op).__name__}")

    def c_BoolOp(self, node: ast.BoolOp) -> _Node:
        parts = [self.compile(v) for v in node.values]
        kernel = pc.and_kleene if isinstance(node.op, ast.And) else pc.or_kleene

        def fn(table: pa.Table):
            out = _as_bool_array(parts[0](table), len(table))
            for p in parts[1:]:
                out = kernel(out, _as_bool_array(p(table), len(table)))
            return out

        return _Node(fn)

    def c_BinOp(self, node: ast.BinOp) -> _Node:
        left = self.compile(node.left)
        right = self.compile(node.right)
        if isinstance(node.op, ast.Div):
            def div(t):
                lv, rv = _to_double(left(t)), _to_double(right(t))
                return pc.divide(lv, rv)
            return _Node(div)
        kernel = _BIN_KERNELS.get(type(node.op))
        if kernel is None:
            raise ExprCompileError(f"unsupported operator {type(node.op).__name__}")
        return _Node(lambda t: kernel(left(t), right(t)))

    def c_Compare(self, node: ast.Compare) -> _Node:
        ast_operands = [node.left] + list(node.comparators)
        operands = [self.compile(v) for v in ast_operands]
        legs: List[Evaluator] = []
        for i, op in enumerate(node.ops):
            lhs, rhs = operands[i], operands[i + 1]
            if isinstance(op, (ast.In, ast.NotIn)):
                legs.append(self._isin_leg(
                    lhs, ast_operands[i + 1], self._type_of(lhs),
                    negate=isinstance(op, ast.NotIn)))
                continue
            kernel = _CMP_KERNELS.get(type(op))
            if kernel is None:
                raise ExprCompileError(f"unsupported comparison {type(op).__name__}")
            lt, rt = self._type_of(lhs), self._type_of(rhs)
            # hoist literal coercion to COMPILE time: a string literal is
            # an ast.Constant, both operand types are already known here,
            # and the coercion (regex + pandas Timestamp parse + tz rules)
            # would otherwise repeat in every Ray task per batch.  A
            # tz-aware-literal-vs-naive-column rejection raised inside
            # _coerce_literal lands HERE, routing to the pandas fallback.
            la, ra = ast_operands[i], ast_operands[i + 1]
            if isinstance(la, ast.Constant) and isinstance(la.value, str):
                lhs = _const_node(_coerce_literal(la.value, rt))
            if isinstance(ra, ast.Constant) and isinstance(ra.value, str):
                rhs = _const_node(_coerce_literal(ra.value, lt))

            def leg(t, _l=lhs, _r=rhs, _k=kernel):
                return _k(_l(t), _r(t))

            legs.append(leg)
        if len(legs) == 1:
            return _Node(legs[0])

        def chained(table: pa.Table):
            out = _as_bool_array(legs[0](table), len(table))
            for leg_fn in legs[1:]:
                out = pc.and_kleene(out, _as_bool_array(leg_fn(table), len(table)))
            return out

        return _Node(chained)

    def _isin_leg(self, lhs: _Node, rhs_ast: ast.AST, lhs_type,
                  negate: bool) -> Evaluator:
        # compile-time: 'in' requires a list literal, so the value set is
        # known here — coerce each element against the column type ONCE
        # (a tz-aware-literal rejection raised by the coercion lands at
        # compile time and routes to the pandas fallback) and build the
        # Arrow value_set once instead of per batch
        if not isinstance(rhs_ast, (ast.List, ast.Tuple, ast.Set)):
            raise ExprCompileError("'in' requires a list literal")
        values = [_coerce_literal(self._const_value(e), lhs_type)
                  for e in rhs_ast.elts]
        value_set = _scalar_value_set(values)

        def fn(table: pa.Table, _vs=value_set):
            out = pc.is_in(lhs(table), value_set=_vs)
            return pc.invert(out) if negate else out

        return fn

    def c_Call(self, node: ast.Call) -> _Node:
        if isinstance(node.func, ast.Name):
            return self._func_call(node)
        if not isinstance(node.func, ast.Attribute):
            raise ExprCompileError("only method calls on columns are supported")
        if (isinstance(node.func.value, ast.Attribute)
                and node.func.value.attr == "str"):
            return self._str_call(node.func.value.value, node.func.attr, node)
        target = self.compile(node.func.value)
        meth = node.func.attr
        args = [self.compile(a) for a in node.args]
        if meth in ("isna", "isnull"):
            return _Node(lambda t: _isna_array(target(t)))
        if meth in ("notna", "notnull"):
            return _Node(lambda t: pc.invert(_isna_array(target(t))))
        if meth == "isin":
            if len(node.args) != 1 or not isinstance(
                    node.args[0], (ast.List, ast.Tuple, ast.Set)):
                raise ExprCompileError("isin takes one list-literal argument")
            tt = self._type_of(target)
            # compile-time coercion + value_set build (see _isin_leg)
            values = [_coerce_literal(self._const_value(e), tt)
                      for e in node.args[0].elts]
            value_set = _scalar_value_set(values)

            def isin_fn(t, _vs=value_set):
                return pc.is_in(target(t), value_set=_vs)

            return _Node(isin_fn)
        if meth == "fillna":
            if len(args) != 1:
                raise ExprCompileError("fillna takes one argument")

            def fillna_fn(t, _a=args[0]):
                return _fillna_array(target(t), _a(t))

            return _Node(fillna_fn)
        if meth == "abs":
            return _Node(lambda t: pc.abs(target(t)))
        raise ExprCompileError(f"unsupported method .{meth}()")

    def _func_call(self, node: ast.Call) -> _Node:
        """Top-level functions — ENGINE EXTENSIONS beyond pandas.eval (so no
        pandas fallback exists for them; they must compile or raise), with
        SQL semantics:

        ``where(cond, a, b)``  = ``CASE WHEN cond THEN a ELSE b END``
            (a null condition takes the ELSE branch, per SQL CASE — NOT
            Kleene null propagation);
        ``coalesce(a, b, ...)`` = first non-null argument left to right,
            where float NaN counts as null (consistent with this engine's
            ``.isna()``, which mirrors pandas' no-NaN/null split);
        ``greatest(a, b, ...)`` / ``least(a, b, ...)`` = element-wise
            max/min where NULL **and NaN** arguments are identities
            (Arrow ``max/min_element_wise`` skip-nulls; matches DuckDB's
            NULL handling exactly, diverges on NaN data only — DuckDB
            sorts NaN greatest, this engine's convention is NaN = null).

        Scalar literals are aligned to the first array operand's type so
        ``where(x > 0, 1, -1)`` and ``ELSE NULL`` (``None``) type cleanly."""
        fname = node.func.id
        if node.keywords:
            raise ExprCompileError(f"{fname}() takes no keyword arguments")
        args = [self.compile(a) for a in node.args]

        def _align(vals):
            arrays = [v for v in vals
                      if isinstance(v, (pa.Array, pa.ChunkedArray))]
            if not arrays:
                return vals
            t = arrays[0].type

            def _is_float(v):
                return (pa.types.is_floating(v.type)
                        if isinstance(v, (pa.Array, pa.ChunkedArray))
                        else isinstance(v, float))

            # SQL type promotion: an integer operand mixed with ANY floating
            # operand yields DOUBLE — casting the float down to the int type
            # would silently truncate (pa.scalar(0.5, int64) == 0)
            if pa.types.is_integer(t) and any(_is_float(v) for v in vals):
                t = pa.float64()
            return [(v if v.type.equals(t) else pc.cast(v, t))
                    if isinstance(v, (pa.Array, pa.ChunkedArray))
                    else pa.scalar(v, type=t) for v in vals]

        if fname == "where":
            if len(args) != 3:
                raise ExprCompileError("where(cond, a, b) takes 3 arguments")
            cond, a, b = args

            def where_fn(t: pa.Table):
                c = _as_bool_array(cond(t), t.num_rows)
                c = pc.fill_null(c, False)  # SQL CASE: null cond -> ELSE
                va, vb = _align([a(t), b(t)])
                return pc.if_else(c, va, vb)

            return _Node(where_fn)
        def _scalar_is_na(v):
            if v is None:
                return True
            if isinstance(v, pa.Scalar):
                if not v.is_valid:
                    return True
                v = v.as_py()
            return isinstance(v, float) and v != v

        if fname == "coalesce":
            if len(args) < 2:
                raise ExprCompileError("coalesce() takes >= 2 arguments")

            def coalesce_fn(t: pa.Table):
                vals = _align([a(t) for a in args])
                out = None  # no non-null source seen yet
                for v in vals:
                    if (not isinstance(v, (pa.Array, pa.ChunkedArray))
                            and _scalar_is_na(v)):
                        continue  # SQL: a NULL/NaN argument is an identity
                    if out is None:
                        out = v
                    else:
                        out = pc.if_else(_isna_array(out), v, out)
                    if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                        break  # non-null CONSTANT — wins every row
                if out is None:  # every argument was a null constant
                    return pa.nulls(t.num_rows)
                if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                    return pa.repeat(out, t.num_rows)  # row-wise constant
                return out

            return _Node(coalesce_fn)
        if fname in ("greatest", "least"):
            if len(args) < 2:
                raise ExprCompileError(f"{fname}() takes >= 2 arguments")
            kernel = (pc.max_element_wise if fname == "greatest"
                      else pc.min_element_wise)

            def gl_fn(t: pa.Table, _k=kernel):
                vals = _align([a(t) for a in args])
                # a NULL/NaN CONSTANT is an identity (DuckDB parity);
                # Arrow's kernel has no (null, T) signature, so dropping
                # it here rather than crashing — null ARRAY slots are
                # already skipped by the kernel itself
                live = [v for v in vals
                        if isinstance(v, (pa.Array, pa.ChunkedArray))
                        or not _scalar_is_na(v)]
                if not live:  # every argument a null constant
                    return pa.nulls(t.num_rows)
                out = live[0] if len(live) == 1 else _k(*live)
                if not isinstance(out, (pa.Array, pa.ChunkedArray)):
                    return pa.repeat(out, t.num_rows)  # all-constant args
                return out

            return _Node(gl_fn)
        raise ExprCompileError(f"unsupported function {fname}()")

    def _str_call(self, base_node: ast.AST, meth: str,
                  node: ast.Call) -> _Node:
        """`col.str.<method>(...)` — pandas string namespace → pyarrow
        string kernels.  Regex-taking methods are RE2-probed at compile
        time (on a NON-empty array — an empty probe never compiles the
        pattern) so backref/lookaround patterns fall back to pandas-eval
        instead of failing inside a Ray task."""
        base = self.compile(base_node)
        kwargs: Dict[str, Any] = {}
        for kw in node.keywords:
            if kw.arg is None:
                raise ExprCompileError("**kwargs not supported")
            kwargs[kw.arg] = self._const_value(kw.value)

        if meth in _STR_SIMPLE:
            if node.args or kwargs:
                raise ExprCompileError(f".str.{meth}() takes no arguments")
            kernel = _STR_SIMPLE[meth]
            return _Node(lambda t, _k=kernel, _b=base: _k(_b(t)))

        def _pat_literal(i: int = 0) -> Any:
            if len(node.args) <= i:
                raise ExprCompileError(f".str.{meth}() missing its pattern")
            arg = node.args[i]
            if isinstance(arg, (ast.Tuple, ast.List)):
                return tuple(self._const_value(e) for e in arg.elts)
            return self._const_value(arg)

        if meth in ("startswith", "endswith"):
            pats = _pat_literal()
            pats = pats if isinstance(pats, tuple) else (pats,)
            if not all(isinstance(p, str) for p in pats) or kwargs:
                raise ExprCompileError(f".str.{meth}() wants str literals")
            kernel = pc.starts_with if meth == "startswith" else pc.ends_with

            def affix(t, _k=kernel, _b=base, _ps=pats):
                arr = _b(t)
                out = _k(arr, pattern=_ps[0])
                for p in _ps[1:]:
                    out = pc.or_(out, _k(arr, pattern=p))
                return out

            return _Node(affix)

        if meth in ("contains", "match", "fullmatch", "count"):
            pat = _pat_literal()
            if not isinstance(pat, str):
                raise ExprCompileError(f".str.{meth}() wants a str pattern")
            case = kwargs.pop("case", True)
            regex = kwargs.pop("regex", True) if meth == "contains" else True
            if kwargs:  # na=, flags=, ... → pandas fallback
                raise ExprCompileError(
                    f".str.{meth}() kwargs {sorted(kwargs)} unsupported")
            if meth == "contains" and not regex:
                return _Node(lambda t, _b=base, _p=pat, _c=case: pc.match_substring(
                    _b(t), pattern=_p, ignore_case=not _c))
            if meth == "match":
                pat = f"^(?:{pat})"
            elif meth == "fullmatch":
                pat = f"^(?:{pat})$"
            kernel = (pc.count_substring_regex if meth == "count"
                      else pc.match_substring_regex)
            try:  # RE2 compile probe — MUST use a non-empty array
                kernel(pa.array(["x"]), pattern=pat, ignore_case=not case)
            except Exception as exc:
                raise ExprCompileError(
                    f".str.{meth}() pattern not RE2-compatible: {exc}")
            return _Node(lambda t, _k=kernel, _b=base, _p=pat, _c=case: _k(
                _b(t), pattern=_p, ignore_case=not _c))

        raise ExprCompileError(f"unsupported method .str.{meth}()")

    def c_Attribute(self, node: ast.Attribute) -> _Node:
        # `col.dt.year`-style accessors (pandas datetime namespace)
        if (
            isinstance(node.value, ast.Attribute)
            and node.value.attr == "dt"
            and node.attr in _DT_FIELDS
        ):
            base = self.compile(node.value.value)
            kernel = _DT_FIELDS[node.attr]
            return _Node(lambda t, _k=kernel, _b=base: _k(_b(t)))
        raise ExprCompileError(f"unsupported attribute .{node.attr}")


def _scalar_value_set(values) -> pa.Array:
    """Arrow array from compile-time coerced literals — temporal coercion
    yields pa.Scalar values whose type must drive the array type."""
    for v in values:
        if isinstance(v, pa.Scalar):
            return pa.array(
                [x.as_py() if isinstance(x, pa.Scalar) else x
                 for x in values], type=v.type)
    return pa.array(list(values))


def _as_bool_array(v, nrows: int):
    if isinstance(v, bool):
        return pa.array(np.full(nrows, v), type=pa.bool_())
    return v


def _to_double(v):
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, (pa.Array, pa.ChunkedArray)) and not _is_float_type(v.type):
        return pc.cast(v, pa.float64())
    return v


class Predicate:
    """A compiled predicate: picklable, evaluates per Arrow block.

    ``mask(table)`` → boolean Array (nulls = no-match);
    ``filter(table)`` → rows where mask is true;
    ``values(table)`` → raw evaluation result (Compliance sums this, matching
    the reference's ``df.eval(pred).sum()`` — compliance.py:33-37).
    """

    def __init__(self, expression: str, schema: Optional[pa.Schema] = None):
        self.expression = expression
        src, colmap = _sanitize_backticks(expression)
        try:
            tree = ast.parse(src, mode="eval")
        except SyntaxError as ex:
            raise ExprCompileError(f"cannot parse expression {expression!r}: {ex}")
        compiler = _Compiler(schema, colmap)
        self._root = compiler.compile(tree)
        self.columns = sorted(compiler.columns)
        self._schema = schema

    def __getstate__(self):
        return {"expression": self.expression, "schema": self._schema}

    def __setstate__(self, state):
        self.__init__(state["expression"], state["schema"])

    def values(self, table: pa.Table):
        return self._root(table)

    def mask(self, table: pa.Table) -> pa.Array:
        out = self._root(table)
        out = _as_bool_array(out, len(table))
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out

    def filter(self, table: pa.Table) -> pa.Table:
        # null mask entries drop the row, matching pandas-query semantics
        return table.filter(self.mask(table))


class PandasPredicate:
    """Fallback: exact pandas.query/eval semantics, evaluated per batch.

    Used when an expression falls outside the compiled surface.  Slower
    (forces an Arrow→pandas conversion per block) but byte-compatible with
    the reference for arbitrary expressions."""

    def __init__(self, expression: str, schema: Optional[pa.Schema] = None):
        self.expression = expression
        self.columns: Sequence[str] = ()

    def values(self, table: pa.Table):
        df = table.to_pandas()
        return pa.array(df.eval(self.expression))

    def mask(self, table: pa.Table) -> pa.Array:
        return pa.array(table.to_pandas().eval(self.expression)).cast(pa.bool_())

    def filter(self, table: pa.Table) -> pa.Table:
        df = table.to_pandas().query(self.expression)
        return pa.Table.from_pandas(df, schema=table.schema, preserve_index=False)


def _sanitize_backticks(expr: str):
    colmap: Dict[str, str] = {}

    def repl(m: "re.Match[str]") -> str:
        ident = f"_BTICKCOL_{len(colmap)}_"
        colmap[ident] = m.group(1)
        return ident

    return _BTICK_RE.sub(repl, expr), colmap


def compile_predicate(expression: str, schema: Optional[pa.Schema] = None):
    """Compile to the fast Arrow path, falling back to pandas-eval semantics
    for anything outside the supported surface.  Missing-column references
    raise ExprCompileError (callers convert to a Failure metric, mirroring
    the reference's precondition behavior)."""
    try:
        return Predicate(expression, schema)
    except ExprCompileError:
        if schema is not None:
            # Column-existence errors should surface as failures, not fall
            # back: re-check by compiling without a schema.
            try:
                unschema = Predicate(expression, None)
            except ExprCompileError:
                return PandasPredicate(expression, schema)
            missing = [c for c in unschema.columns if c not in schema.names]
            if missing:
                raise
        return PandasPredicate(expression, schema)
