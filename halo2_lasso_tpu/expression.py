"""Constraint-system expression IR.

Semantics mirror the reference AST (/root/reference/plonkish_backend/src/util/
expression.rs:60-170): Constant / CommonPolynomial{Identity, Lagrange(i),
EqXY(idx)} / Polynomial(Query{poly, rotation}) / Challenge(idx) / Neg / Sum /
Product / Scaled / DistributePowers (expr0 + sum_{i>=1} base^i * expr_i).

TPU-first difference: instead of compiling expressions to an interpreted
register machine (the reference's ExpressionRegistry, util/expression/
evaluator.rs), expressions are *traced* straight into a jnp computation over
leaf arrays (`evaluate_jnp`) — XLA does the CSE/fusion. Host-side evaluation
over python ints (`evaluate_host`) serves the verifier.

Constants/scalars are canonical python ints (mod p applied by the evaluators).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, FrozenSet, Sequence, Tuple

import jax.numpy as jnp

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.field import FieldSpec


@dataclasses.dataclass(frozen=True)
class Query:
    poly: int
    rotation: int = 0


@dataclasses.dataclass(frozen=True)
class Expression:
    """Algebraic expression node. `kind` in {const, identity, lagrange, eq_xy,
    poly, challenge, neg, sum, product, scaled, powers}."""

    kind: str
    args: Tuple = ()

    # ---- constructors ----

    @staticmethod
    def constant(v: int) -> "Expression":
        return Expression("const", (int(v),))

    @staticmethod
    def identity() -> "Expression":
        return Expression("identity")

    @staticmethod
    def lagrange(i: int) -> "Expression":
        return Expression("lagrange", (int(i),))

    @staticmethod
    def eq_xy(idx: int) -> "Expression":
        return Expression("eq_xy", (int(idx),))

    @staticmethod
    def poly(idx: int, rotation: int = 0) -> "Expression":
        return Expression("poly", (Query(idx, rotation),))

    @staticmethod
    def challenge(idx: int) -> "Expression":
        return Expression("challenge", (int(idx),))

    @staticmethod
    def distribute_powers(exprs: Sequence["Expression"], base: "Expression") -> "Expression":
        exprs = list(exprs)
        assert exprs
        if len(exprs) == 1:
            return exprs[0]
        return Expression("powers", (tuple(exprs), base))

    # ---- operators ----

    def __neg__(self):
        return Expression("neg", (self,))

    def __add__(self, other):
        other = _coerce(other)
        return Expression("sum", (self, other))

    def __radd__(self, other):
        return _coerce(other) + self

    def __sub__(self, other):
        return self + (-_coerce(other))

    def __rsub__(self, other):
        return _coerce(other) + (-self)

    def __mul__(self, other):
        if isinstance(other, int):
            return Expression("scaled", (self, other))
        return Expression("product", (self, other))

    def __rmul__(self, other):
        return self.__mul__(other)

    # ---- generic catamorphism with DAG memoization ----

    def evaluate(
        self,
        constant: Callable,
        common_poly: Callable,
        poly: Callable,
        challenge: Callable,
        negated: Callable,
        sum_: Callable,
        product: Callable,
        scaled: Callable,
    ):
        memo: Dict[int, object] = {}

        def go(e: "Expression"):
            key = id(e)
            if key in memo:
                return memo[key]
            k = e.kind
            if k == "const":
                r = constant(e.args[0])
            elif k in ("identity", "lagrange", "eq_xy"):
                r = common_poly(e)
            elif k == "poly":
                r = poly(e.args[0])
            elif k == "challenge":
                r = challenge(e.args[0])
            elif k == "neg":
                r = negated(go(e.args[0]))
            elif k == "sum":
                r = sum_(go(e.args[0]), go(e.args[1]))
            elif k == "product":
                r = product(go(e.args[0]), go(e.args[1]))
            elif k == "scaled":
                r = scaled(go(e.args[0]), e.args[1])
            elif k == "powers":
                exprs, base = e.args
                if len(exprs) == 1:
                    r = go(exprs[0])
                else:
                    b = go(base)
                    acc = go(exprs[0])
                    power = b
                    for i, ex in enumerate(exprs[1:]):
                        if i > 0:
                            power = product(power, b)
                        acc = sum_(acc, product(power, go(ex)))
                    r = acc
            else:
                raise ValueError(f"unknown kind {k}")
            memo[key] = r
            return r

        return go(self)

    # ---- queries ----

    @functools.cached_property
    def degree(self) -> int:
        return self.evaluate(
            lambda _: 0,
            lambda _: 1,
            lambda _: 1,
            lambda _: 0,
            lambda a: a,
            lambda a, b: max(a, b),
            lambda a, b: a + b,
            lambda a, _: a,
        )

    def _collect(self, select: Callable) -> FrozenSet:
        return self.evaluate(
            lambda v: frozenset(),
            lambda e: select("common", e),
            lambda q: select("poly", q),
            lambda c: select("challenge", c),
            lambda a: a,
            lambda a, b: a | b,
            lambda a, b: a | b,
            lambda a, _: a,
        )

    @functools.cached_property
    def used_query(self) -> FrozenSet[Query]:
        return self._collect(
            lambda t, v: frozenset([v]) if t == "poly" else frozenset()
        )

    @functools.cached_property
    def used_poly(self) -> FrozenSet[int]:
        return frozenset(q.poly for q in self.used_query)

    @functools.cached_property
    def used_rotation(self) -> FrozenSet[int]:
        return frozenset(q.rotation for q in self.used_query)

    @functools.cached_property
    def used_lagrange(self) -> FrozenSet[int]:
        return self._collect(
            lambda t, v: frozenset([v.args[0]])
            if t == "common" and v.kind == "lagrange"
            else frozenset()
        )

    @functools.cached_property
    def used_eq_xy(self) -> FrozenSet[int]:
        return self._collect(
            lambda t, v: frozenset([v.args[0]])
            if t == "common" and v.kind == "eq_xy"
            else frozenset()
        )

    @functools.cached_property
    def used_identity(self) -> bool:
        return bool(
            self._collect(
                lambda t, v: frozenset([0])
                if t == "common" and v.kind == "identity"
                else frozenset()
            )
        )

    @functools.cached_property
    def used_challenge(self) -> FrozenSet[int]:
        return self._collect(
            lambda t, v: frozenset([v]) if t == "challenge" else frozenset()
        )

    def max_used_rotation_distance(self) -> int:
        return max((abs(r) for r in self.used_rotation), default=0)


def _coerce(v) -> Expression:
    if isinstance(v, Expression):
        return v
    if isinstance(v, int):
        return Expression.constant(v)
    raise TypeError(f"cannot coerce {type(v)} to Expression")


# ---------------------------------------------------------------------------
# evaluators
# ---------------------------------------------------------------------------


def evaluate_host(expr: Expression, p: int, leaf_fn: Callable, challenges: Sequence[int]) -> int:
    """Evaluate over python ints mod p. `leaf_fn(kind, arg)` supplies values for
    'identity' / ('lagrange', i) / ('eq_xy', idx) / Query leaves."""
    return expr.evaluate(
        lambda v: v % p,
        lambda e: leaf_fn(e.kind, e.args[0] if e.args else None) % p,
        lambda q: leaf_fn("poly", q) % p,
        lambda c: challenges[c] % p,
        lambda a: (-a) % p,
        lambda a, b: (a + b) % p,
        lambda a, b: (a * b) % p,
        lambda a, s: (a * s) % p,
    )


def evaluate_jnp(
    spec: FieldSpec,
    expr: Expression,
    leaf_fn: Callable,
    challenges: Sequence[jnp.ndarray],
):
    """Trace the expression into a jnp computation over leaf arrays.

    `leaf_fn(kind, arg)` returns a (n, L) array for 'identity' /
    ('lagrange', i) / ('eq_xy', idx) / Query leaves. Challenges are (L,)
    Montgomery limb arrays. Constants/scalars are encoded on the fly.
    """

    def const(v):
        return jnp.asarray(spec.encode([v % spec.modulus]))[0]

    return expr.evaluate(
        lambda v: const(v),
        lambda e: leaf_fn(e.kind, e.args[0] if e.args else None),
        lambda q: leaf_fn("poly", q),
        lambda c: challenges[c],
        lambda a: F.neg(spec, a),
        lambda a, b: F.add(spec, a, b),
        lambda a, b: F.mont_mul(spec, a, b),
        lambda a, s: F.mont_mul(spec, a, const(s)),
    )
