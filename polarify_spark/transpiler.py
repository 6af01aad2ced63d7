"""AST -> ``F.when`` compiler: the core of polarify-spark.

Takes a Python function written with ordinary imperative control flow
(``if/elif/else``, ``match``, assignments, early ``return``) and compiles its
body into a single vectorized PySpark ``Column`` expression —
``F.when(cond, val).when(...).otherwise(val)`` — which Catalyst then
analyzes/optimizes/codegens natively.

Behavioral parity with the reference transpiler (Quantco/polarify,
``/root/reference/polarify/main.py``) is documented per construct below.  The
implementation here is an independent, Spark-first rewrite: a *functional fold*
over an immutable-ish branch tree instead of the reference's mutating State
classes, and codegen targets ``pyspark.sql.functions.when`` (which takes
``(cond, value)`` in one call — no ``.then`` — unlike Polars).

Semantics implemented (SURVEY.md section 2 numbering):

* S1-S4  assignments (plain / annotated / multi-target / destructuring) with
  eager forward-substitution into an env of fully-inlined expressions
  (reference ``main.py:138-157,264-266``).
* S5     ``if/elif/else`` -> *nested* conditional tree; sequential ``if``
  statements distribute into every open leaf (reference ``main.py:275-289``).
* S6/S7  early/partial ``return``; bare ``return`` rejected
  (reference ``main.py:291-299,360-361``).
* S8     ``match`` -> *flat* multi-arm conditional (reference
  ``main.py:301-347``), with dead-case elision and catch-all -> otherwise
  (reference ``main.py:311-324``).
* M1-M9  match-pattern translation (reference ``main.py:189-262``).
* E1-E9  expression whitelist + substitution (reference ``main.py:79-126``);
  deviation (documented in SURVEY.md section 7): we also substitute inside a
  call's *function* position (``node.func``) and through attribute access, so
  ``s = x + 1; return s.abs()`` works instead of producing a ``NameError``
  (reference bug, ``main.py:104-107``).

This module imports only the stdlib — never pyspark — so transpilation is
unit-testable without a SparkSession (mirrors reference ``main.py:1-7``).
"""

from __future__ import annotations

import ast
import contextvars
import sys
from dataclasses import dataclass
from typing import Union

__all__ = [
    "compile_block",
    "branch_tree_to_expr",
    "when_chain",
    "substitute",
    "allow_boolops",
    "allow_chained_comparisons",
    "TranspileError",
]

_MATCH_SUPPORTED = sys.version_info >= (3, 10)

#: opt-in `and`/`or` -> `&`/`|` rewrite (SURVEY.md section 2.3 E8 "optional
#: future"). Default off for reference parity: Python's `and`/`or` invoke
#: truthiness, which is illegal on a Column, so they are rejected with an
#: actionable message. A contextvar (not a parameter) so the flag doesn't
#: have to thread through every recursive compile call; transpilation is
#: synchronous, and contextvars nest/restore correctly.
allow_boolops: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "polarify_spark_allow_boolops", default=False
)

#: opt-in chained-comparison rewrite: `a < x < b` -> `(a < x) & (x < b)`.
#: Default off for parity (the reference rejects chained comparisons).
#: Middle operands are duplicated into both comparisons — the transpiler's
#: normal forward-substitution behavior; Catalyst's subexpression
#: elimination recovers the cost.
allow_chained_comparisons: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "polarify_spark_allow_chained_comparisons", default=False
)


class TranspileError(ValueError):
    """Raised for any construct the transpiler does not support.

    Subclasses ``ValueError`` so callers that match the reference's error
    contract (``pytest.raises(ValueError)``) keep working.
    """


# ---------------------------------------------------------------------------
# Branch tree: the compile-time IR.
#
# A function body compiles to a tree of three node kinds:
#   Open(env)              -- control flow still running; env maps variable
#                             name -> fully-substituted defining expression
#   Leaf(expr)             -- this path returned `expr`
#   Switch(arms, default)  -- a conditional: ordered (test, subtree) arms plus
#                             a default subtree
# Statements are *folded* over the tree: applying a statement to a Switch
# recurses into every arm and the default; Leaf nodes are frozen (a returned
# path ignores later statements — early-return semantics, reference
# main.py:268-299); only Open nodes actually consume the statement.
# ---------------------------------------------------------------------------


@dataclass
class Open:
    env: dict[str, ast.expr]


@dataclass
class Leaf:
    expr: ast.expr


@dataclass
class Switch:
    arms: list[tuple[ast.expr, "Node"]]
    default: "Node"


Node = Union[Open, Leaf, Switch]


# ---------------------------------------------------------------------------
# Expression substitution + validation (reference InlineTransformer,
# main.py:79-126). Whitelisting visitor: anything outside the supported
# grammar raises TranspileError.
# ---------------------------------------------------------------------------


class _Substituter(ast.NodeTransformer):
    """Replace bound names by their defining expressions, recursively.

    Substitution is eager and repeated (a substituted expression is itself
    re-visited), so the env always holds closed forms over the function's
    parameters and free globals. Operates on a fresh copy of the input tree so
    stored env expressions are never aliased into the output.
    """

    def __init__(self, env: dict[str, ast.expr]):
        self._env = env

    # E1 — names: substitute if bound, else leave free (function parameters,
    # references to `F`, user helper functions...).
    def visit_Name(self, node: ast.Name) -> ast.expr:
        bound = self._env.get(node.id)
        if bound is not None:
            return self.visit(bound)
        return node

    # E2 / E3 — arithmetic & bitwise operators; every ast binop/unaryop is
    # admitted, matching the reference (no per-operator filtering).
    def visit_BinOp(self, node: ast.BinOp) -> ast.expr:
        return ast.BinOp(left=self.visit(node.left), op=node.op, right=self.visit(node.right))

    def visit_UnaryOp(self, node: ast.UnaryOp) -> ast.expr:
        # `not` is admitted syntactically for parity (reference passes it
        # through and the host engine rejects it at runtime); under the
        # boolop-rewrite flag it becomes `~`, the Column negation, so
        # `not (a and b)` style predicates work end to end.
        if isinstance(node.op, ast.Not) and allow_boolops.get():
            return ast.UnaryOp(op=ast.Invert(), operand=self.visit(node.operand))
        return ast.UnaryOp(op=node.op, operand=self.visit(node.operand))

    # E4 — calls. Deviation from the reference: we substitute into `node.func`
    # as well (through Attribute chains), fixing the receiver-not-inlined bug
    # (reference main.py:104-107; decision recorded in SURVEY.md section 7).
    def visit_Call(self, node: ast.Call) -> ast.expr:
        return ast.Call(
            func=self.visit(node.func),
            args=[self.visit(a) for a in node.args],
            keywords=[ast.keyword(arg=k.arg, value=self.visit(k.value)) for k in node.keywords],
        )

    def visit_Attribute(self, node: ast.Attribute) -> ast.expr:
        return ast.Attribute(value=self.visit(node.value), attr=node.attr, ctx=ast.Load())

    # E5 — conditional expressions compile to a one-arm when/otherwise.
    def visit_IfExp(self, node: ast.IfExp) -> ast.expr:
        return when_chain(
            [(self.visit(node.test), self.visit(node.body))],
            self.visit(node.orelse),
        )

    # E6 — literals pass through untouched; F.when auto-wraps them in lit().
    def visit_Constant(self, node: ast.Constant) -> ast.expr:
        return node

    # E7 — single comparisons only. Chained comparisons (0 < x < 10) would
    # need Python truthiness on a Column, which neither Spark nor Polars
    # supports (reference main.py:118-123); under the
    # `allow_chained_comparisons` flag they are rewritten to an `&` fold of
    # the pairwise comparisons (exactly Python's chained semantics when
    # every comparison is boolean, which on Columns it always is).
    def visit_Compare(self, node: ast.Compare) -> ast.expr:
        if len(node.comparators) != 1:
            if not allow_chained_comparisons.get():
                raise TranspileError(
                    "Spark Columns can't handle chained comparisons; "
                    "rewrite `a < x < b` as `(a < x) & (x < b)`"
                )
            operands = [self.visit(node.left)] + [
                self.visit(c) for c in node.comparators
            ]
            out: ast.expr | None = None
            for lhs, op, rhs in zip(operands, node.ops, operands[1:]):
                pair: ast.expr = ast.Compare(left=lhs, ops=[op], comparators=[rhs])
                out = (
                    pair
                    if out is None
                    else ast.BinOp(left=out, op=ast.BitAnd(), right=pair)
                )
            assert out is not None
            return out
        return ast.Compare(
            left=self.visit(node.left),
            ops=node.ops,
            comparators=[self.visit(node.comparators[0])],
        )

    # E8 — `and`/`or`: rejected by default (parity — truthiness is illegal
    # on a Column in both engines); under the `allow_boolops` flag rewritten
    # to a left fold of `&`/`|` over the (recursively substituted) operands.
    # Sound only when every operand is boolean-valued (comparisons, other
    # boolean columns): for those, `a and b` and `a & b` agree; Python's
    # return-the-operand short-circuit semantics for non-boolean operands
    # are NOT reproduced, which is why this is opt-in.
    def visit_BoolOp(self, node: ast.BoolOp) -> ast.expr:
        if not allow_boolops.get():
            return self.generic_visit(node)
        op = ast.BitAnd() if isinstance(node.op, ast.And) else ast.BitOr()
        values = [self.visit(v) for v in node.values]
        out = values[0]
        for value in values[1:]:
            out = ast.BinOp(left=out, op=op, right=value)
        return out

    # E8/E9 — everything else (BoolOp and/or without the flag, walrus,
    # dict/set literals, lambdas...) is rejected, matching the reference's
    # whitelist (main.py:125-126). The error message names the node type so
    # tests can match on e.g. "ast.BoolOp".
    def generic_visit(self, node: ast.AST) -> ast.AST:
        raise TranspileError(
            f"Unsupported expression type: {type(node)!r}"
            + (
                " (use `&` / `|` on parenthesized comparisons instead of `and` / `or`)"
                if isinstance(node, ast.BoolOp)
                else ""
            )
        )


def substitute(expr: ast.expr, env: dict[str, ast.expr]) -> ast.expr:
    """Return ``expr`` with every env-bound name replaced by its definition."""
    out = _Substituter(env).visit(expr)
    if not isinstance(out, ast.expr):  # pragma: no cover - defensive
        raise TranspileError(f"substitution produced a non-expression: {out!r}")
    return out


# ---------------------------------------------------------------------------
# Codegen: fold (test, value) pairs into an F.when(...).when(...).otherwise()
# call chain (reference build_polars_when_then_otherwise, main.py:49-75 — but
# PySpark's `when` takes (cond, value) in a single call and has no `.then`).
# ---------------------------------------------------------------------------


def when_chain(arms: list[tuple[ast.expr, ast.expr]], default: ast.expr) -> ast.Call:
    """Build the AST for ``F.when(t1, v1).when(t2, v2)...otherwise(default)``."""
    if not arms:
        raise TranspileError("when_chain needs at least one (test, value) arm")
    chain: ast.expr = ast.Name(id="F", ctx=ast.Load())
    for test, value in arms:
        chain = ast.Call(
            func=ast.Attribute(value=chain, attr="when", ctx=ast.Load()),
            args=[test, value],
            keywords=[],
        )
    return ast.Call(
        func=ast.Attribute(value=chain, attr="otherwise", ctx=ast.Load()),
        args=[default],
        keywords=[],
    )


# ---------------------------------------------------------------------------
# Statement folding.
# ---------------------------------------------------------------------------


def _bind(env: dict[str, ast.expr], target: ast.expr, value: ast.expr) -> None:
    """Bind one assignment target. Handles names and (nested) tuple/list
    destructuring against literal tuple/list RHS (reference main.py:138-157).
    """
    if isinstance(target, ast.Name):
        env[target.id] = substitute(value, env)
    elif isinstance(target, (ast.Tuple, ast.List)):
        if not isinstance(value, (ast.Tuple, ast.List)):
            raise TranspileError(
                f"Assignment target is {type(target)}, but value is {type(value)}"
            )
        if any(isinstance(t, ast.Starred) for t in target.elts):
            raise TranspileError("Unsupported expression type: starred assignment targets")
        if len(target.elts) != len(value.elts):
            raise TranspileError(
                f"Cannot destructure {len(value.elts)} values into "
                f"{len(target.elts)} targets"
            )
        for sub_target, sub_value in zip(target.elts, value.elts):
            _bind(env, sub_target, sub_value)
    else:
        raise TranspileError(
            f"Unsupported expression type inside assignment target: {type(target)}"
        )


def _apply_assign(node: Node, stmt: ast.Assign | ast.AnnAssign) -> Node:
    if isinstance(node, Leaf):
        return node
    if isinstance(node, Switch):
        return Switch(
            arms=[(t, _apply_assign(sub, stmt)) for t, sub in node.arms],
            default=_apply_assign(node.default, stmt),
        )
    # S2 — annotated assignment: the annotation is discarded (main.py:264-266).
    if isinstance(stmt, ast.AnnAssign):
        if stmt.value is None:
            raise TranspileError("annotated assignment without a value is not supported")
        _bind(node.env, stmt.target, stmt.value)
    else:
        # S3 — multi-target `a = b = e`.
        for target in stmt.targets:
            _bind(node.env, target, stmt.value)
    return node


def _apply_if(node: Node, stmt: ast.If) -> Node:
    if isinstance(node, Leaf):
        return node
    if isinstance(node, Switch):
        return Switch(
            arms=[(t, _apply_if(sub, stmt)) for t, sub in node.arms],
            default=_apply_if(node.default, stmt),
        )
    # S5 — an `if` on a live path becomes a single-arm Switch; the elif chain
    # lives in stmt.orelse and therefore nests inside `default`, giving the
    # nested (not flat) chain shape of the reference (main.py:275-289).
    test = substitute(stmt.test, node.env)
    return Switch(
        arms=[(test, compile_block(stmt.body, dict(node.env)))],
        default=compile_block(stmt.orelse, dict(node.env)),
    )


def _apply_return(node: Node, value: ast.expr) -> Node:
    if isinstance(node, Leaf):
        return node
    if isinstance(node, Switch):
        return Switch(
            arms=[(t, _apply_return(sub, value)) for t, sub in node.arms],
            default=_apply_return(node.default, value),
        )
    return Leaf(substitute(value, node.env))


# -- match statements -------------------------------------------------------


def _is_catch_all(case: ast.match_case) -> bool:
    """A trailing ``case _:`` with no guard; Python guarantees it is last."""
    return (
        isinstance(case.pattern, ast.MatchAs)
        and case.pattern.name is None
        and case.guard is None
    )


def _is_statically_dead(subject: ast.expr, case: ast.match_case) -> bool:
    """Dead-case elision, reference ``ignore_case`` main.py:311-317: a
    sequence pattern whose arity differs from a literal tuple subject, or a
    value pattern against a tuple subject, can never match."""
    if isinstance(subject, ast.Tuple):
        if isinstance(case.pattern, ast.MatchSequence):
            return len(subject.elts) != len(case.pattern.patterns)
        if isinstance(case.pattern, ast.MatchValue):
            return True
    return False


def _pattern_test(
    env: dict[str, ast.expr],
    subject: ast.expr,
    pattern: ast.pattern,
    guard: ast.expr | None,
) -> ast.expr | None:
    """Translate one match pattern into a plain boolean ``ast.expr`` (not yet
    substituted), binding capture names into ``env`` as a side effect.

    Returns ``None`` when the pattern imposes no constraint (a bare capture),
    so callers can AND partial tests together. Mirrors reference
    ``translate_match`` (main.py:189-262) including the quirk that capture
    bindings land in the *shared* env, visible to later cases.
    """
    if isinstance(pattern, ast.MatchValue):
        # M1 — `case 3:` -> subject == 3, guard ANDed in front.
        test: ast.expr = ast.Compare(
            left=subject, ops=[ast.Eq()], comparators=[pattern.value]
        )
        if guard is not None:
            test = ast.BinOp(left=guard, op=ast.BitAnd(), right=test)
        return test
    if isinstance(pattern, ast.MatchAs):
        # M2 — `case y ...:` binds y = subject (eagerly substituted), then the
        # only constraint is the guard. A bare `case y:` with no guard crashes
        # the reference with an unhelpful NoneType error (verified; SURVEY.md
        # section 2.2 M2) — we raise the same ValueError type with a clear
        # message.
        if pattern.name is not None:
            _bind(env, ast.Name(id=pattern.name, ctx=ast.Store()), subject)
        return guard
    if isinstance(pattern, ast.MatchOr):
        # M3 — `case 0 | 1:` right-folds into BitOr of the alternatives.
        first, rest = pattern.patterns[0], pattern.patterns[1:]
        left = _pattern_test(env, subject, first, guard)
        if len(rest) == 1:
            right = _pattern_test(env, subject, rest[0], None)
        else:
            right = _pattern_test(env, subject, ast.MatchOr(patterns=list(rest)), None)
        if left is None or right is None:
            raise TranspileError("capture patterns inside `|` alternatives are not supported")
        return ast.BinOp(left=left, op=ast.BitOr(), right=right)
    if isinstance(pattern, ast.MatchSequence):
        # M4 / M7 / M8 — element-wise AND over a literal tuple subject; star
        # patterns and non-tuple subjects rejected (main.py:237-258).
        if any(isinstance(p, ast.MatchStar) for p in pattern.patterns):
            raise TranspileError("starred patterns are not supported.")
        if not isinstance(subject, ast.Tuple):
            raise TranspileError("Matching lists is not supported.")
        parts: list[ast.expr] = []
        if guard is not None:
            parts.append(guard)
        for sub_subject, sub_pattern in zip(subject.elts, pattern.patterns):
            part = _pattern_test(env, sub_subject, sub_pattern, None)
            if part is not None:
                parts.append(part)
        if not parts:
            return None
        test = parts[0]
        for part in parts[1:]:
            test = ast.BinOp(left=test, op=ast.BitAnd(), right=part)
        return test
    # M9 — mapping/class/other patterns.
    if isinstance(pattern, ast.MatchMapping):
        raise TranspileError(
            f"Incompatible match and subject types: {type(pattern)} "
            "(ast.MatchMapping and class patterns are not supported)."
        )
    if isinstance(pattern, ast.MatchClass):
        raise TranspileError(
            f"Incompatible match and subject types: {type(pattern)} "
            "(class patterns are not supported)."
        )
    raise TranspileError(
        f"Incompatible match and subject types: {type(pattern)} and {type(subject)}."
    )


def _apply_match(node: Node, stmt: ast.Match) -> Node:
    if isinstance(node, Leaf):
        return node
    if isinstance(node, Switch):
        return Switch(
            arms=[(t, _apply_match(sub, stmt)) for t, sub in node.arms],
            default=_apply_match(node.default, stmt),
        )
    # S8 — one *flat* Switch with an arm per live case (contrast nested `if`).
    # Capture bindings mutate node.env during translation *before* each case
    # body is compiled with a copy — reference behavior (main.py:325-343),
    # including bindings from earlier cases being visible to later ones.
    default_body: list[ast.stmt] = []
    for case in stmt.cases:
        if _is_catch_all(case):
            default_body = case.body
            break
    arms: list[tuple[ast.expr, Node]] = []
    for case in stmt.cases:
        if _is_catch_all(case) or _is_statically_dead(stmt.subject, case):
            continue
        raw_test = _pattern_test(node.env, stmt.subject, case.pattern, case.guard)
        if raw_test is None:
            raise TranspileError(
                "match case imposes no constraint and is not a catch-all; "
                "this pattern is not supported"
            )
        arms.append(
            (
                substitute(raw_test, node.env),
                compile_block(case.body, dict(node.env)),
            )
        )
    return Switch(arms=arms, default=compile_block(default_body, dict(node.env)))


# -- the block compiler -----------------------------------------------------


def compile_block(stmts: list[ast.stmt], env: dict[str, ast.expr] | None = None) -> Node:
    """Fold a statement list into a branch tree (reference ``parse_body``,
    main.py:350-369). Statements after a block-level ``return`` are dead code
    and skipped."""
    node: Node = Open(env if env is not None else {})
    for stmt in stmts:
        if isinstance(stmt, (ast.Assign, ast.AnnAssign)):
            node = _apply_assign(node, stmt)
        elif isinstance(stmt, ast.If):
            node = _apply_if(node, stmt)
        elif isinstance(stmt, ast.Return):
            if stmt.value is None:
                # S7 — the generated expression must produce a value.
                raise TranspileError("return needs a value")
            node = _apply_return(node, stmt.value)
            break  # O4 — dead-code elimination after a block-level return.
        elif isinstance(stmt, ast.Match):
            if not _MATCH_SUPPORTED:  # pragma: no cover - py>=3.10 here
                raise TranspileError("match statements need Python >= 3.10")
            node = _apply_match(node, stmt)
        else:
            # S9 — loops, with, nested def, global, expression statements...
            raise TranspileError(f"Unsupported statement type: {type(stmt)}")
    return node


def branch_tree_to_expr(node: Node) -> ast.expr:
    """Resolve a branch tree into one expression (reference
    ``transform_tree_into_expr``, main.py:372-388)."""
    if isinstance(node, Leaf):
        return node.expr
    if isinstance(node, Switch):
        if not node.arms:
            # O2 — every case was statically dead: collapse to the default.
            return branch_tree_to_expr(node.default)
        return when_chain(
            [(test, branch_tree_to_expr(sub)) for test, sub in node.arms],
            branch_tree_to_expr(node.default),
        )
    raise TranspileError("Not all branches return")
