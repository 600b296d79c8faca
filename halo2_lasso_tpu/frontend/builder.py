"""Native circuit-builder frontend.

The reference's frontend adapts zcash/halo2 circuits into the plonkish IR
(/root/reference/plonkish_backend/src/frontend/halo2.rs): it captures the
constraint system, converts gates/lookups/permutations to Expressions, and
synthesizes witnesses with rows placed via the bh `row_mapping`
(halo2.rs:100-244, backend row_mapping at hyperplonk.rs:365-369).

This module provides the same capability as a first-class API: columns
(instance / fixed / advice with phases), selectors, gates over rotated
column references, lookups, and equality (copy) constraints — producing a
`PlonkishCircuitInfo` + `PlonkishCircuit` pair for the HyperPlonk backend.
Row-indexed assignments are scattered into hypercube order through
`row_mapping`, and copy cells are translated to hypercube indices, exactly
as the halo2 adapter does.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from halo2_lasso_tpu.backend import PlonkishCircuit, PlonkishCircuitInfo
from halo2_lasso_tpu.backend.hyperplonk.prover import row_mapping
from halo2_lasso_tpu.expression import Expression
from halo2_lasso_tpu.ops.bn254 import Fr

P = Fr.modulus


@dataclasses.dataclass(frozen=True)
class Column:
    kind: str  # "instance" | "fixed" | "advice"
    index: int  # index within its kind
    phase: int = 0

    def rot(self, rotation: int) -> "ColumnQuery":
        return ColumnQuery(self, rotation)

    @property
    def cur(self) -> "ColumnQuery":
        return ColumnQuery(self, 0)

    @property
    def next(self) -> "ColumnQuery":
        return ColumnQuery(self, 1)

    @property
    def prev(self) -> "ColumnQuery":
        return ColumnQuery(self, -1)


@dataclasses.dataclass(frozen=True)
class ColumnQuery:
    column: Column
    rotation: int


class CircuitBuilder:
    """Collects circuit structure; `build()` returns (info, circuit)."""

    def __init__(self, k: int, num_phases: int = 1):
        self.k = k
        self.n = 1 << k
        self.num_phases = num_phases
        self._instance_cols: List[Column] = []
        self._fixed_cols: List[Column] = []
        self._advice_cols: List[List[Column]] = [[] for _ in range(num_phases)]
        self._challenges_per_phase = [0] * num_phases
        self._gates: List[Tuple[str, Callable]] = []
        self._lookups: List[Tuple[str, List[Tuple[Callable, Callable]]]] = []
        self._lasso_lookups: List[Tuple[str, object, Callable]] = []
        self._copies: List[Tuple[ColumnQuery, int, ColumnQuery, int]] = []
        self.max_degree: Optional[int] = None

    # ---- structure ----

    def instance_column(self) -> Column:
        col = Column("instance", len(self._instance_cols))
        self._instance_cols.append(col)
        return col

    def fixed_column(self) -> Column:
        col = Column("fixed", len(self._fixed_cols))
        self._fixed_cols.append(col)
        return col

    selector = fixed_column

    def advice_column(self, phase: int = 0) -> Column:
        col = Column("advice", sum(len(c) for c in self._advice_cols), phase)
        self._advice_cols[phase].append(col)
        return col

    def challenge(self, phase: int = 0) -> int:
        """Returns the global challenge index usable in expressions."""
        idx = sum(self._challenges_per_phase[: phase + 1])
        self._challenges_per_phase[phase] += 1
        return idx

    def gate(self, name: str, fn: Callable[["ExprCtx"], Expression]):
        self._gates.append((name, fn))

    def lookup(self, name: str, fn: Callable[["ExprCtx"], List[Tuple[Expression, Expression]]]):
        self._lookups.append((name, fn))

    def lasso_lookup(self, name: str, table, fn):
        """Declare a Lasso lookup (the reference goal's first-class lookup
        argument; see lasso/integration.py). `table` is a LassoTable;
        `fn(ctx) -> (inputs, output)` where `inputs` is a sequence of one
        index Expression (plain tables) or two operand Expressions
        (interleaved-operand tables like AND/XOR/LT) and `output` is the
        looked-up value Expression — all over rotation-0 column refs.
        Mirrors how the reference frontend routes user circuits into every
        backend feature (frontend/halo2.rs:100-216)."""
        self._lasso_lookups.append((name, table, fn))

    def copy(self, a: Column, row_a: int, b: Column, row_b: int):
        """Equality constraint between two cells (row-indexed)."""
        self._copies.append((a.cur, row_a, b.cur, row_b))

    # ---- column index layout (matches backend expectations) ----

    def _poly_index(self, col: Column) -> int:
        if col.kind == "instance":
            return col.index
        if col.kind == "fixed":
            return len(self._instance_cols) + col.index
        return len(self._instance_cols) + len(self._fixed_cols) + col.index

    def expr(self, q) -> Expression:
        if isinstance(q, Column):
            q = q.cur
        if isinstance(q, ColumnQuery):
            return Expression.poly(self._poly_index(q.column), q.rotation)
        raise TypeError(type(q))

    # ---- build ----

    def build(
        self,
        fixed_assignments: Dict[Tuple[int, int], int],
        advice_fn: Callable[[int, Sequence[int]], List[List[int]]],
        instances: List[List[int]],
    ) -> Tuple[PlonkishCircuitInfo, "BuiltCircuit"]:
        """fixed_assignments: {(fixed col index, row): value}; advice_fn(phase,
        challenges) -> row-indexed advice columns for that phase; instances:
        instance values per instance column."""
        rm = row_mapping(self.k)

        preprocess = []
        by_col: Dict[int, List[Tuple[int, int]]] = {}
        for (ci, row), v in fixed_assignments.items():
            by_col.setdefault(ci, []).append((row, v))
        for col in self._fixed_cols:
            vals = [0] * self.n
            for row, v in by_col.get(col.index, ()):
                vals[int(rm[row])] = v % P
            preprocess.append(vals)

        ctx = self
        constraints = [fn(ctx) for _, fn in self._gates]
        lookups = [fn(ctx) for _, fn in self._lookups]
        lasso_lookups = []
        if self._lasso_lookups:
            from halo2_lasso_tpu.lasso.integration import LassoLookup

            for _, table, fn in self._lasso_lookups:
                inputs, output = fn(ctx)
                lasso_lookups.append(LassoLookup(table, tuple(inputs), output))

        permutations = _cycles_from_copies(
            [
                (self._poly_index(a.column), int(rm[ra]), self._poly_index(b.column), int(rm[rb]))
                for a, ra, b, rb in self._copies
            ]
        )

        info = PlonkishCircuitInfo(
            k=self.k,
            num_instances=[len(v) for v in instances],
            preprocess_polys=preprocess,
            num_witness_polys=[len(c) for c in self._advice_cols],
            num_challenges=(
                self._challenges_per_phase[:-1] + [max(self._challenges_per_phase[-1], 0)]
                if self.num_phases > 1
                else [self._challenges_per_phase[0]]
            ),
            constraints=constraints,
            lookups=lookups,
            permutations=permutations,
            max_degree=self.max_degree,
            lasso_lookups=lasso_lookups,
        )
        return info, BuiltCircuit(self, advice_fn, instances, rm)


class BuiltCircuit(PlonkishCircuit):
    def __init__(self, builder: CircuitBuilder, advice_fn, instances, rm):
        self._builder = builder
        self._advice_fn = advice_fn
        self._instances = instances
        self._rm = rm

    def instances(self):
        return self._instances

    def synthesize(self, round_: int, challenges):
        cols_rows = self._advice_fn(round_, list(challenges))
        n = self._builder.n
        out = []
        for col in cols_rows:
            if isinstance(col, np.ndarray) and col.dtype != object:
                # vectorized scatter for machine-int witnesses (the python
                # per-row loop costs seconds per column at 2^20 rows)
                vals = np.zeros(n, dtype=np.int64)
                vals[self._rm[: len(col)]] = col
                out.append(vals)
                continue
            vals = [0] * n
            for row, v in enumerate(col):
                vals[int(self._rm[row])] = v % P
            out.append(vals)
        return out


def _cycles_from_copies(copies):
    """Union-find over cells -> closed cycles (frontend/halo2.rs:392-461)."""
    parent: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    cells = set()
    for pa, ia, pb, ib in copies:
        a, b = (pa, ia), (pb, ib)
        cells.add(a)
        cells.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    groups: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for c in cells:
        groups.setdefault(find(c), []).append(c)
    return [sorted(g) for g in groups.values() if len(g) > 1 or True]
