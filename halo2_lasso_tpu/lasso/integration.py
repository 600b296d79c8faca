"""Lasso as HyperPlonk's first-class lookup argument (the repo's namesake).

The reference's stated goal is "implement Lasso lookup argument in a
HyperPlonk backend" (/root/reference/README.md:3-7); its snapshot only has
the logup path (backend/hyperplonk/prover.rs:139-250, preprocessor.rs:
79-109). This module supplies the Lasso path with the same hook shape:

  * a circuit declares `lasso_lookups` on its `PlonkishCircuitInfo`: a
    `LassoLookup(table, inputs, output)` constrains, on every row i,
    `output(i) == table[index(i)]` where `index` is `inputs[0]` for plain
    tables and `(inputs[0] << operand_bits) | inputs[1]` for two-operand
    tables (AND/XOR/OR/LT);
  * the prover commits the Surge witness columns — per-chunk `dim` polys,
    per-memory `E` (subtable reads) and `read_ts` polys — in the main
    transcript right after the witness phases;
  * the pointwise bindings join the main zero check as ordinary
    constraints:  output − g(E…) = 0  and  operand − Σ_j 2^{jb}·dim_j = 0
    (`lasso_constraints`), so no separate "primary sumcheck" is needed: the
    zero check already proves pointwise identities over the hypercube;
  * the offline memory check (read set ∪ final state == write set ∪ init
    state, multiset fingerprints h = ts·γ² + val·γ + addr − τ) runs as
    batched GKR grand products (piop/gkr.py in pure-product mode), with the
    m-sized leaf openings folded into the main PCS batch opening and the
    table-sized `final_cts` openings batch-opened per subtable size.

Soundness of the index binding: every `dim` poly is forced into its chunk
range by the memory check itself — plain-table dims address subtables of
exactly the chunk domain, and two-operand dims each get a dedicated
identity-subtable "range memory" (addr = val = dim). Without those, the
combined address  dim_x·2^b + dim_y  being in range would NOT force each
operand chunk into [0, 2^b) and the linear recombination would alias.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.expression import Expression, evaluate_jnp
from halo2_lasso_tpu.lasso.tables import (
    LassoTable,
    Subtable,
    identity_subtable,
)
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.piop import gkr
from halo2_lasso_tpu.poly import multilinear as mle

P = Fr.modulus


from halo2_lasso_tpu.errors import Halo2LassoError


class LassoIntegrationError(Halo2LassoError):
    pass


@dataclasses.dataclass(frozen=True)
class LassoLookup:
    """A circuit-level Lasso lookup: on every row, output == table[index].

    `inputs`: one Expression (the index) for plain tables, two (x operand,
    y operand) for `interleaved_operands` tables. Expressions are over the
    circuit's poly index space, rotation 0 only. Rows that should not look
    anything up must be steered to a valid default index by a selector
    inside the expressions (same convention as logup lookups)."""

    table: LassoTable
    inputs: Tuple[Expression, ...]
    output: Expression


@dataclasses.dataclass(frozen=True)
class MemSpec:
    """One offline-checked memory. addr = Σ coeff·local_poly over
    `addr_terms` [(local poly idx, coeff)]; `e_local`/`ts_local` are local
    poly slots (e_local may alias a dim slot for identity subtables);
    `is_real` memories feed the table's collation polynomial g."""

    addr_terms: Tuple[Tuple[int, int], ...]
    subtable: Subtable
    e_local: int
    ts_local: int
    is_real: bool


class LassoLayout:
    """Local committed-poly layout for one lookup.

    Slots: [dims | extra E polys | read_ts polys (interleaved with E in
    memory order)]. All slots are m-sized (2^num_vars) committed polys."""

    def __init__(self, lookup: LassoLookup):
        t = lookup.table
        b = t.chunk_bits
        c = t.num_chunks
        if t.interleaved_operands:
            if len(lookup.inputs) != 2:
                raise LassoIntegrationError(
                    f"table {t.name} takes two operand expressions"
                )
            self.num_dims = 2 * c  # x chunks [0, c), y chunks [c, 2c)
        else:
            if len(lookup.inputs) != 1:
                raise LassoIntegrationError(
                    f"table {t.name} takes one index expression"
                )
            self.num_dims = c
        self.table = t
        mems: List[MemSpec] = []
        slot = self.num_dims
        for mem in t.memories:
            if t.interleaved_operands:
                addr_terms = ((mem.chunk, 1 << b), (c + mem.chunk, 1))
            else:
                addr_terms = ((mem.chunk, 1),)
            if (
                getattr(mem.subtable, "is_identity", False)
                and len(addr_terms) == 1
                and addr_terms[0][1] == 1
            ):
                e_local = addr_terms[0][0]  # E ≡ dim; reuse the commitment
            else:
                e_local = slot
                slot += 1
            ts_local = slot
            slot += 1
            mems.append(MemSpec(addr_terms, mem.subtable, e_local, ts_local, True))
        if t.interleaved_operands:
            # dedicated range memories force each operand chunk into [0, 2^b)
            sub = identity_subtable(b)
            for d in range(2 * c):
                mems.append(MemSpec(((d, 1),), sub, d, slot, False))
                slot += 1
        self.mems = mems
        self.num_local = slot

    def g_expression(self, offset: int, lookup: LassoLookup) -> Expression:
        """The table's collation g with memory-local polys remapped to
        global indices (global = offset + e_local of real memory j)."""
        real = [m for m in self.mems if m.is_real]
        mapping = {j: offset + m.e_local for j, m in enumerate(real)}
        return _remap_polys(lookup.table.g, mapping)


def _remap_polys(expr: Expression, mapping: Dict[int, int]) -> Expression:
    E = Expression
    return expr.evaluate(
        E.constant,
        lambda e: e,
        lambda q: E.poly(mapping[q.poly], q.rotation),
        E.challenge,
        lambda a: -a,
        lambda a, b: a + b,
        lambda a, b: a * b,
        lambda a, s: a * s,
    )


def layouts_for(circuit_info) -> List[LassoLayout]:
    return [LassoLayout(lk) for lk in circuit_info.lasso_lookups]


def num_lasso_polys(circuit_info) -> int:
    return sum(l.num_local for l in layouts_for(circuit_info))


def lasso_constraints(circuit_info, offset: int) -> List[Expression]:
    """Pointwise bindings added to the zero check (preprocessor hook).

    Per lookup: output − g(E…) = 0 plus one linear chunk-recombination
    constraint per operand. `offset` = global index of the first lasso
    poly."""
    cons: List[Expression] = []
    off = offset
    for lk, layout in zip(circuit_info.lasso_lookups, layouts_for(circuit_info)):
        t = lk.table
        b = t.chunk_bits
        c = t.num_chunks
        cons.append(lk.output - layout.g_expression(off, lk))
        if t.interleaved_operands:
            for op in range(2):
                acc = None
                for j in range(c):
                    term = Expression.poly(off + op * c + j) * (1 << (b * j))
                    acc = term if acc is None else acc + term
                cons.append(lk.inputs[op] - acc)
        else:
            acc = None
            for j in range(c):
                term = Expression.poly(off + j) * (1 << (b * j))
                acc = term if acc is None else acc + term
            cons.append(lk.inputs[0] - acc)
        off += layout.num_local
    return cons


# ---------------------------------------------------------------------------
# prover: Surge witness columns
# ---------------------------------------------------------------------------


def _read_ts_and_final(addr: np.ndarray, n_sub: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-read timestamps (rank within each address group) + final counts —
    sort/segment form of offline memory checking's per-address counters."""
    m = addr.shape[0]
    order = np.argsort(addr, kind="stable")
    sorted_addr = addr[order]
    boundaries = np.nonzero(np.diff(sorted_addr))[0] + 1
    starts = np.concatenate([[0], boundaries])
    counts = np.diff(np.concatenate([starts, [m]]))
    group_start = np.repeat(starts, counts)
    ranks = np.arange(m, dtype=np.int64) - group_start
    ts = np.empty(m, dtype=np.int64)
    ts[order] = ranks
    fc = np.zeros(n_sub, dtype=np.int64)
    fc[sorted_addr[starts]] = counts
    return ts, fc


@functools.partial(jax.jit, static_argnums=1)
def _read_ts_and_final_dev(addr: jnp.ndarray, n_sub: int):
    """DEVICE sort/segment offline-memory counters: per-read timestamp =
    rank within its address group; final count = reads per address.
    The device twin of `_read_ts_and_final` (same semantics, tested equal) —
    at 2^20 lookups the host round-trip + numpy pass per memory was the last
    witness-path host cost."""
    m = addr.shape[0]
    order = jnp.argsort(addr, stable=True)
    sa = jnp.take(addr, order)
    i = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sa[1:] != sa[:-1]]
    )
    group_start = jax.lax.cummax(jnp.where(is_start, i, 0))
    ranks = (i - group_start).astype(jnp.uint32)
    ts = jnp.zeros(m, dtype=jnp.uint32).at[order].set(ranks)
    fc = jnp.zeros(n_sub, dtype=jnp.uint32).at[addr].add(1)
    return ts, fc


def _digits_from_mont_dev(
    spec, v_mont: jnp.ndarray, bits: int, b: int, c: int
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Montgomery limbs (n, L) -> c uint32 digit arrays of b bits each +
    an out-of-range flag, entirely on device.

    16-bit limbs make every b<=16 digit a two-limb shift/mask — the pure
    uint32 replacement for the per-row host bigint decode (the host loop
    measured ~16s/column at 2^20; this is one fused XLA pass)."""
    if b > F.LIMB_BITS:
        raise LassoIntegrationError("chunk_bits > 16 unsupported on device")
    limbs = F.from_mont(spec, v_mont)  # canonical (n, L)
    L = spec.num_limbs
    # range check: every bit at position >= bits must be zero
    full = bits // F.LIMB_BITS
    rem = bits % F.LIMB_BITS
    hi_zero = jnp.all(limbs[:, full + (1 if rem else 0) :] == 0)
    if rem:
        hi_zero = jnp.logical_and(hi_zero, jnp.all(limbs[:, full] < (1 << rem)))
    digits = []
    for j in range(c):
        o = b * j
        li, sh = divmod(o, F.LIMB_BITS)
        d = limbs[:, li] >> sh
        if sh + b > F.LIMB_BITS and li + 1 < L:
            d = d | (limbs[:, li + 1] << (F.LIMB_BITS - sh))
        digits.append(d & jnp.uint32((1 << b) - 1))
    return digits, hi_zero


def build_lookup_witness(
    spec,
    lookup: LassoLookup,
    layout: LassoLayout,
    polys: Sequence[jnp.ndarray],
    challenges: Sequence[int],
    num_vars: int,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Evaluate the lookup's input expressions over all rows and build the
    committed local polys + final_cts arrays — all on device.

    Device-native Surge witness path: expression eval, digit extraction,
    subtable gathers, and the sort/segment read-timestamp counters all stay
    on device; the only host sync is one bool per input expression (the
    range check). Replaces the hashmap counters of the reference's logup
    m-poly builder (prover.rs:150-180) with index arithmetic, as SURVEY §2
    prescribes for the TPU."""
    from halo2_lasso_tpu.backend.hyperplonk.prover import _expr_leaf_fn

    t = lookup.table
    b = t.chunk_bits
    c = t.num_chunks
    n = 1 << num_vars
    chal_dev = [jnp.asarray(spec.encode([ch]))[0] for ch in challenges]

    def eval_digits(e: Expression, bits: int, nch: int) -> List[jnp.ndarray]:
        leaf = _expr_leaf_fn(spec, num_vars, polys, e)
        v = evaluate_jnp(spec, e, leaf, chal_dev)
        if v.ndim == 1:
            v = jnp.broadcast_to(v, (n,) + v.shape)
        digits, in_range = _digits_from_mont_dev(spec, v, bits, b, nch)
        if not bool(np.asarray(in_range)):
            raise LassoIntegrationError(
                f"lookup input out of range for table {t.name} ({bits} bits)"
            )
        return digits

    if t.interleaved_operands:
        ob = b * c
        dims = eval_digits(lookup.inputs[0], ob, c) + eval_digits(
            lookup.inputs[1], ob, c
        )
    else:
        dims = eval_digits(lookup.inputs[0], t.index_bits, c)

    local: List = [None] * layout.num_local
    for j, d in enumerate(dims):
        local[j] = F.u32_to_mont(spec, d)
    fcs: List[jnp.ndarray] = []
    for ms in layout.mems:
        addr = dims[ms.addr_terms[0][0]] * jnp.uint32(ms.addr_terms[0][1])
        for dl, coeff in ms.addr_terms[1:]:
            addr = addr + dims[dl] * jnp.uint32(coeff)
        if ms.e_local >= layout.num_dims:
            local[ms.e_local] = jnp.take(_subtable_dev(ms.subtable), addr, axis=0)
        ts, fc = _read_ts_and_final_dev(addr, 1 << ms.subtable.index_bits)
        local[ms.ts_local] = F.u32_to_mont(spec, ts)
        fcs.append(F.u32_to_mont(spec, fc))
    return local, fcs


# ---------------------------------------------------------------------------
# memory check (shared fingerprint algebra)
# ---------------------------------------------------------------------------


def _fingerprint_dev(spec, addr, val, ts, gamma: int, tau: int) -> jnp.ndarray:
    """h = ts·γ² + val·γ + addr − τ over device arrays."""
    p = spec.modulus
    g1 = jnp.asarray(spec.encode([gamma]))[0]
    g2 = jnp.asarray(spec.encode([gamma * gamma % p]))[0]
    td = jnp.asarray(spec.encode([tau]))[0]
    acc = F.mont_mul(spec, ts, g2[None, :])
    acc = F.add(spec, acc, F.mont_mul(spec, val, g1[None, :]))
    acc = F.add(spec, acc, addr)
    return F.sub(spec, acc, jnp.broadcast_to(td, acc.shape))


def _addr_dev(spec, layout: LassoLayout, locals_dev, ms: MemSpec) -> jnp.ndarray:
    (dl0, c0) = ms.addr_terms[0]
    acc = locals_dev[dl0]
    if c0 != 1:
        acc = F.mont_mul(spec, acc, jnp.asarray(spec.encode([c0]))[0][None, :])
    for dl, coeff in ms.addr_terms[1:]:
        term = locals_dev[dl]
        if coeff != 1:
            term = F.mont_mul(spec, term, jnp.asarray(spec.encode([coeff]))[0][None, :])
        acc = F.add(spec, acc, term)
    return acc


def _n_groups(layouts: Sequence[LassoLayout]) -> Dict[int, List[Tuple[int, int]]]:
    """Subtable-size groups: nv_n -> [(lookup idx, memory idx)], sorted."""
    groups: Dict[int, List[Tuple[int, int]]] = {}
    for li, layout in enumerate(layouts):
        for mi, ms in enumerate(layout.mems):
            groups.setdefault(ms.subtable.index_bits, []).append((li, mi))
    return dict(sorted(groups.items()))


@functools.lru_cache(maxsize=None)
def _subtable_dev(subtable: Subtable):
    # encode_dev: vectorized host limb extraction + one device mont_mul —
    # the per-element `encode` loop costs seconds at 2^16 subtable sizes
    return F.encode_dev(Fr, subtable.values())


def prove_memory_check(
    spec,
    layouts: Sequence[LassoLayout],
    locals_by_lookup: Sequence[Sequence[jnp.ndarray]],
    fcs_by_lookup: Sequence[Sequence[jnp.ndarray]],
    gamma: int,
    tau: int,
    num_vars: int,
    transcript,
) -> Tuple[List[int], Dict[int, List[int]]]:
    """Batched grand products over read/write/init/final fingerprint sets.
    Returns (x_m, {nv_n: x_n}) — the GKR evaluation points whose leaf claims
    the caller must open through the PCS."""
    p = spec.modulus
    rs, ws = [], []
    one = jnp.broadcast_to(jnp.asarray(spec.one), (1 << num_vars, spec.num_limbs))
    for layout, locs in zip(layouts, locals_by_lookup):
        for ms in layout.mems:
            addr = _addr_dev(spec, layout, locs, ms)
            val = locs[ms.e_local]
            ts = locs[ms.ts_local]
            rs.append(_fingerprint_dev(spec, addr, val, ts, gamma, tau))
            ws.append(
                _fingerprint_dev(spec, addr, val, F.add(spec, ts, one), gamma, tau)
            )
    nb = 2 * len(rs)
    # ps=None: pure grand products (GKR skips the zero numerators entirely)
    qs_m = rs + ws
    del rs, ws  # GKR consumes the list (HBM: b x 2^k fingerprint arrays)
    _, _, x_m, _ = gkr.prove_fractional_sum_check(
        [0] * nb, [None] * nb, [None] * nb, qs_m, transcript
    )
    del qs_m

    x_ns: Dict[int, List[int]] = {}
    for nv_n, members in _n_groups(layouts).items():
        n_sub = 1 << nv_n
        addr_n = F.u32_to_mont(spec, jnp.arange(n_sub, dtype=jnp.uint32))
        zeros_n = jnp.zeros((n_sub, spec.num_limbs), dtype=jnp.uint32)
        inits, finals = [], []
        for li, mi in members:
            ms = layouts[li].mems[mi]
            tvals = _subtable_dev(ms.subtable)
            inits.append(_fingerprint_dev(spec, addr_n, tvals, zeros_n, gamma, tau))
            finals.append(
                _fingerprint_dev(spec, addr_n, tvals, fcs_by_lookup[li][mi], gamma, tau)
            )
        nbn = 2 * len(members)
        _, _, x_n, _ = gkr.prove_fractional_sum_check(
            [0] * nbn, [None] * nbn, [None] * nbn, inits + finals, transcript
        )
        x_ns[nv_n] = x_n
    return x_m, x_ns


def verify_memory_check(
    spec,
    layouts: Sequence[LassoLayout],
    gamma: int,
    tau: int,
    num_vars: int,
    transcript,
) -> Tuple[List[int], List[int], Dict[int, Tuple[List[int], List[int], List[int]]]]:
    """Mirror of prove_memory_check. Returns (x_m, rs/ws bottom claims at
    x_m in memory order, {nv_n: (x_n, init claims, final claims)}); raises on
    a failed multiset product check."""
    p = spec.modulus
    total_mems = sum(len(l.mems) for l in layouts)
    nb = 2 * total_mems
    _, q_m, x_m, (_, q0_m) = gkr.verify_fractional_sum_check(
        num_vars, [0] * nb, [None] * nb, transcript
    )
    rs_prods, ws_prods = q0_m[:total_mems], q0_m[total_mems:]

    groups = _n_groups(layouts)
    n_claims: Dict[int, Tuple[List[int], List[int], List[int]]] = {}
    init_prod: Dict[Tuple[int, int], int] = {}
    final_prod: Dict[Tuple[int, int], int] = {}
    for nv_n, members in groups.items():
        nbn = 2 * len(members)
        _, q_n, x_n, (_, q0_n) = gkr.verify_fractional_sum_check(
            nv_n, [0] * nbn, [None] * nbn, transcript
        )
        n_claims[nv_n] = (x_n, q_n[: len(members)], q_n[len(members) :])
        for pos, key in enumerate(members):
            init_prod[key] = q0_n[pos]
            final_prod[key] = q0_n[len(members) + pos]

    # multiset equality per memory: RS · S_final == WS · S_init
    k = 0
    for li, layout in enumerate(layouts):
        for mi in range(len(layout.mems)):
            if (
                rs_prods[k] * final_prod[(li, mi)] % p
                != ws_prods[k] * init_prod[(li, mi)] % p
            ):
                raise LassoIntegrationError(
                    f"memory check product mismatch (lookup {li}, memory {mi})"
                )
            k += 1
    return x_m, q_m, n_claims


def check_m_fingerprints(
    spec,
    layouts: Sequence[LassoLayout],
    local_evals_by_lookup: Sequence[Sequence[int]],
    q_m: Sequence[int],
    gamma: int,
    tau: int,
) -> None:
    """Verifier: GKR bottom claims at x_m must equal the fingerprints
    recombined from the PCS openings of dim/E/read_ts at x_m."""
    p = spec.modulus
    g2 = gamma * gamma % p
    total = sum(len(l.mems) for l in layouts)
    k = 0
    for li, (layout, evs) in enumerate(zip(layouts, local_evals_by_lookup)):
        for mi, ms in enumerate(layout.mems):
            addr = sum(evs[dl] * coeff for dl, coeff in ms.addr_terms) % p
            e_val = evs[ms.e_local]
            ts = evs[ms.ts_local]
            h_rs = (ts * g2 + e_val * gamma + addr - tau) % p
            h_ws = ((ts + 1) * g2 + e_val * gamma + addr - tau) % p
            if h_rs != q_m[k] or h_ws != q_m[total + k]:
                raise LassoIntegrationError(
                    f"fingerprint opening mismatch (lookup {li}, memory {mi})"
                )
            k += 1


def check_n_fingerprints(
    spec,
    layouts: Sequence[LassoLayout],
    nv_n: int,
    members: Sequence[Tuple[int, int]],
    x_n: Sequence[int],
    init_claims: Sequence[int],
    final_claims: Sequence[int],
    fc_evals: Sequence[int],
    gamma: int,
    tau: int,
) -> None:
    """Verifier: init/final bottom claims at x_n against the public subtable
    MLE (closed form when available) + the final_cts openings."""
    p = spec.modulus
    g2 = gamma * gamma % p
    addr_eval = mle.identity_eval_host(p, x_n)
    for pos, (li, mi) in enumerate(members):
        sub = layouts[li].mems[mi].subtable
        t_eval = _subtable_mle_eval(sub, x_n)
        h_init = (t_eval * gamma + addr_eval - tau) % p
        h_final = (fc_evals[pos] * g2 + t_eval * gamma + addr_eval - tau) % p
        if h_init != init_claims[pos] or h_final != final_claims[pos]:
            raise LassoIntegrationError(
                f"init/final fingerprint mismatch (lookup {li}, memory {mi})"
            )


def _subtable_mle_eval(subtable: Subtable, x: Sequence[int]) -> int:
    if subtable.mle_eval is not None:
        return subtable.mle_eval([xi % P for xi in x])
    vals = [int(v) for v in subtable.values()]
    for xi in reversed(x):
        half = len(vals) // 2
        vals = [(lo + (hi - lo) * xi) % P for lo, hi in zip(vals[:half], vals[half:])]
    return vals[0]
