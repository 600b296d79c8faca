"""Brakedown: transparent hash-based multilinear PCS over an expander code.

Semantics mirror /root/reference/plonkish_backend/src/util/code/brakedown.rs
(+ pcs/multilinear/brakedown.rs): the [GLSTW21] linear code with sparse
expander matrices A/B and a Reed-Solomon base case, six 128-bit parameter
specs; commit = encode rows + merklize columns (Keccak256); open = proximity
rows + column openings; verify re-encodes and checks merkle paths.

Codeword layout (brakedown.rs:88-126):
  [ x | A_0 x | A_1 A_0 x | ... | RS(A_last ...) | B_last out | ... | B_0 out ]
where B_j consumes the contiguous b_j.n-long block starting at A_j's output.

TPU mapping: sparse matvecs run on device as gather -> mont_mul -> lazy
scatter-add (renormalized once); RS base case is a tiny dense vandermonde
product; hashing stays host-side (sequential keccak), per SURVEY.md.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.ops.keccak import Keccak256
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.poly import multilinear as mle

P = Fr.modulus
LOG2_Q = 254  # Fr::NUM_BITS


def _h(p: float) -> float:
    return -p * math.log2(p) - (1 - p) * math.log2(1 - p)


def _ceil(v: float) -> int:
    return int(math.ceil(v))


@dataclasses.dataclass(frozen=True)
class BrakedownSpec:
    """Figure 2 of [GLSTW21]; lambda = 128 (brakedown.rs:237-260)."""

    alpha: float
    beta: float
    r: float
    lambda_: float = 128.0

    @property
    def delta(self):
        return self.beta / self.r

    @property
    def mu(self):
        return self.r - 1.0 - self.r * self.alpha

    @property
    def nu(self):
        return self.beta + self.alpha * self.beta + 0.03

    def c_n(self, n: int) -> int:
        a, b = self.alpha, self.beta
        nf = float(n)
        return min(
            max(_ceil(1.28 * b * nf), _ceil(b * nf) + 4),
            _ceil(
                ((110.0 / nf) + _h(b) + a * _h(1.28 * b / a))
                / (b * math.log2(a / (1.28 * b)))
            ),
        )

    def d_n(self, log2_q: int, n: int) -> int:
        a, b, r = self.alpha, self.beta, self.r
        mu, nu = self.mu, self.nu
        nf = float(n)
        return min(
            _ceil((2.0 * b + ((r - 1.0) + 110.0 / nf) / log2_q) * nf),
            _ceil(
                (r * a * _h(b / r) + mu * _h(nu / mu) + 110.0 / nf)
                / (a * b * math.log2(mu / nu))
            ),
        )

    def num_column_opening(self) -> int:
        return _ceil(-self.lambda_ / math.log2(1.0 - self.delta / 3.0))

    def num_proximity_testing(self, log2_q: int, n: int, n_0: int) -> int:
        return _ceil(
            self.lambda_
            / (log2_q - math.log2(float(self.codeword_len(log2_q, n, n_0))))
        )

    def dimensions(self, log2_q: int, n: int, n_0: int):
        """(a_dims, b_dims) as (n, m, d) triples (brakedown.rs:184-206)."""
        assert n > n_0
        a_dims = []
        cur = n
        while cur > n_0:
            m = _ceil(cur * self.alpha)
            a_dims.append((cur, m, min(self.c_n(cur), m)))
            cur = m
        b_dims = []
        for (an, am, _) in a_dims:
            n_prime = _ceil(am * self.r)
            m_prime = _ceil(an * self.r) - an - n_prime
            b_dims.append((n_prime, m_prime, min(self.d_n(log2_q, an), m_prime)))
        return a_dims, b_dims

    def codeword_len(self, log2_q: int, n: int, n_0: int) -> int:
        a, b = self.dimensions(log2_q, n, n_0)
        return a[0][0] + sum(x[1] for x in a[:-1]) + b[-1][0] + sum(x[1] for x in b)


SPEC1 = BrakedownSpec(0.1195, 0.0284, 1.420)
SPEC2 = BrakedownSpec(0.1380, 0.0444, 1.470)
SPEC3 = BrakedownSpec(0.1780, 0.0610, 1.521)
SPEC4 = BrakedownSpec(0.2000, 0.0820, 1.640)
SPEC5 = BrakedownSpec(0.2110, 0.0970, 1.616)
SPEC6 = BrakedownSpec(0.2380, 0.1205, 1.720)


class SparseMatrix:
    """Random d-per-row sparse matrix; device gather/scatter matvec."""

    def __init__(self, n: int, m: int, d: int, rng: np.random.RandomState):
        self.n, self.m, self.d = n, m, d
        rows_idx, cols_idx, coeffs = [], [], []
        for row in range(n):
            cols = set()
            while len(cols) < min(d, m):
                cols.add(int(rng.randint(m)))
            for col in sorted(cols):
                rows_idx.append(row)
                cols_idx.append(col)
                coeffs.append(int.from_bytes(rng.bytes(40), "little") % P)
        self.rows_idx = jnp.asarray(np.array(rows_idx, dtype=np.int32))
        self.cols_idx = jnp.asarray(np.array(cols_idx, dtype=np.int32))
        self.coeffs = jnp.asarray(Fr.encode(coeffs))

    def dot(self, input_: jnp.ndarray) -> jnp.ndarray:
        """(n, L) -> (m, L): gather, mul, lazy scatter-add, renormalize."""
        vals = F.mont_mul(Fr, jnp.take(input_, self.rows_idx, axis=0), self.coeffs)
        lazy = (
            jnp.zeros((self.m, Fr.num_limbs), dtype=jnp.uint32)
            .at[self.cols_idx]
            .add(vals)
        )
        t = jnp.pad(lazy, [(0, 0), (0, Fr.num_limbs)])
        return F.mont_mul(Fr, F._mont_reduce(Fr, t), jnp.asarray(Fr.r2))


class BrakedownCode:
    """brakedown.rs Brakedown::new_multilinear + encode."""

    def __init__(self, num_vars: int, n_0: int, spec: BrakedownSpec, rng):
        assert (1 << num_vars) > n_0
        min_log2_n = (n_0 + 1 - 1).bit_length()
        best = (None, None)
        for log2_n in range(min_log2_n, num_vars + 1):
            c = 1 << log2_n
            r = 1 << (num_vars - log2_n)
            num_ldt = spec.num_proximity_testing(LOG2_Q, c, n_0)
            proof_size = (1 + num_ldt) * c + spec.num_column_opening() * r
            if best[0] is None or proof_size < best[0]:
                best = (proof_size, c)
        self.row_len = best[1]
        self.spec = spec
        self.n_0 = n_0
        self.codeword_len = spec.codeword_len(LOG2_Q, self.row_len, n_0)
        self.num_column_opening = spec.num_column_opening()
        self.num_proximity_testing = spec.num_proximity_testing(
            LOG2_Q, self.row_len, n_0
        )
        a_dims, b_dims = spec.dimensions(LOG2_Q, self.row_len, n_0)
        self.a = [SparseMatrix(n, m, d, rng) for (n, m, d) in a_dims]
        self.b = [SparseMatrix(n, m, d, rng) for (n, m, d) in b_dims]

    def encode(self, row: jnp.ndarray) -> jnp.ndarray:
        """(row_len, L) -> (codeword_len, L)."""
        chunks: List[jnp.ndarray] = [row]
        inp = row
        for a in self.a[:-1]:
            inp = a.dot(inp)
            chunks.append(inp)
        tmp = self.a[-1].dot(inp)
        # Reed-Solomon base case: evaluate tmp as coeffs at x = 1, 2, ...
        rs_len = self.b[-1].n
        ncoef = tmp.shape[0]
        xs = np.arange(1, rs_len + 1, dtype=object)
        pw = np.ones((rs_len, ncoef), dtype=object)
        for j in range(1, ncoef):
            pw[:, j] = pw[:, j - 1] * xs % P
        pw_dev = jnp.asarray(Fr.encode(pw))  # (rs_len, ncoef, L)
        prods = F.mont_mul(Fr, pw_dev, tmp[None, :, :])
        rs_out = prods[:, 0]
        for j in range(1, ncoef):
            rs_out = F.add(Fr, rs_out, prods[:, j])
        chunks.append(rs_out)

        # B stages, last to first: B_j reads the contiguous block of length
        # b_j.n starting at A_j's output position sum_{i<=j} a_i.n.
        a_n_prefix = np.cumsum([a.n for a in self.a])
        for j in range(len(self.b) - 1, -1, -1):
            stream = jnp.concatenate(chunks, axis=0)
            start = int(a_n_prefix[j])
            block = stream[start : start + self.b[j].n]
            chunks.append(self.b[j].dot(block))
        out = jnp.concatenate(chunks, axis=0)
        assert out.shape[0] == self.codeword_len, (out.shape, self.codeword_len)
        return out


# ---------------------------------------------------------------------------
# PCS layer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BrakedownParams:
    num_vars: int
    num_rows: int
    code: BrakedownCode


@dataclasses.dataclass
class BrakedownCommitment:
    rows: np.ndarray  # host ints (num_rows, codeword_len)
    tree: List[List[bytes]]  # level 0 = leaf hashes (padded pow2), ... root
    root: bytes


def _hash_fe(hasher: Keccak256, v: int):
    hasher.update(int(v).to_bytes(32, "little"))


def _merkle_tree(leaf_hashes: List[bytes]) -> Tuple[List[List[bytes]], bytes]:
    n = len(leaf_hashes)
    width = 1 << max((n - 1).bit_length(), 0)
    level = leaf_hashes + [bytes(32)] * (width - n)
    levels = [level]
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            h = Keccak256()
            h.update(level[i])
            h.update(level[i + 1])
            nxt.append(h.digest())
        levels.append(nxt)
        level = nxt
    return levels, level[0]


class MultilinearBrakedown:
    SPEC = SPEC6

    @classmethod
    def setup(cls, poly_size: int, rng=None) -> BrakedownParams:
        if rng is None:
            rng = np.random.RandomState(0)
        num_vars = poly_size.bit_length() - 1
        n_0 = min(20, poly_size - 1)
        code = BrakedownCode(num_vars, n_0, cls.SPEC, rng)
        return BrakedownParams(
            num_vars=num_vars, num_rows=poly_size // code.row_len, code=code
        )

    @staticmethod
    def trim(param: BrakedownParams, poly_size: int):
        if poly_size != 1 << param.num_vars:
            raise PcsError("can't trim Brakedown params to a different size")
        return param, param

    @staticmethod
    def commit(pp: BrakedownParams, evals: jnp.ndarray) -> BrakedownCommitment:
        row_len = pp.code.row_len
        rows = []
        for r in range(pp.num_rows):
            cw = pp.code.encode(evals[r * row_len : (r + 1) * row_len])
            rows.append(Fr.decode(np.asarray(cw)))
        rows = np.stack(rows)  # (num_rows, codeword_len) object ints

        leaf_hashes = []
        for col in range(pp.code.codeword_len):
            h = Keccak256()
            for r in range(pp.num_rows):
                _hash_fe(h, int(rows[r, col]))
            leaf_hashes.append(h.digest())
        tree, root = _merkle_tree(leaf_hashes)
        return BrakedownCommitment(rows=rows, tree=tree, root=root)

    @staticmethod
    def batch_commit(pp, polys):
        return [MultilinearBrakedown.commit(pp, p) for p in polys]

    @staticmethod
    def write_commitment(comm: BrakedownCommitment, transcript):
        transcript.write_hash(comm.root)

    # generic PCS transcript IO (backend-facing). NOTE: mirroring the
    # reference, hash commitments are streamed WITHOUT state absorption
    # (util/transcript.rs:240-263 — the Output<Keccak256> write/read impls
    # do not call common_commitment).
    @staticmethod
    def write_commitments(comms: Sequence[BrakedownCommitment], transcript):
        for c in comms:
            transcript.write_hash(c.root)

    @staticmethod
    def read_commitments(vp, n: int, transcript) -> List[bytes]:
        return [transcript.read_hash() for _ in range(n)]

    @staticmethod
    def verifier_commitment(comm: BrakedownCommitment) -> bytes:
        return comm.root

    @staticmethod
    def open(pp: BrakedownParams, evals: jnp.ndarray, comm: BrakedownCommitment,
             point: Sequence[int], eval_, transcript) -> None:
        row_len = pp.code.row_len
        codeword_len = pp.code.codeword_len
        vals = Fr.decode(np.asarray(evals)).reshape(pp.num_rows, row_len)

        t_0, t_1 = _point_to_tensor(pp.num_rows, point)
        if pp.num_rows > 1:
            for _ in range(pp.code.num_proximity_testing):
                coeffs = transcript.squeeze_challenges(pp.num_rows)
                combined = [
                    sum(int(vals[r, c]) * coeffs[r] for r in range(pp.num_rows)) % P
                    for c in range(row_len)
                ]
                transcript.write_field_elements(combined)
            t0_combined = [
                sum(int(vals[r, c]) * t_0[r] for r in range(pp.num_rows)) % P
                for c in range(row_len)
            ]
        else:
            t0_combined = [int(v) % P for v in vals[0]]
        transcript.write_field_elements(t0_combined)

        depth = max((codeword_len - 1).bit_length(), 0)
        for _ in range(pp.code.num_column_opening):
            column = transcript.squeeze_challenge_idx(codeword_len)
            transcript.write_field_elements(
                [int(comm.rows[r, column]) for r in range(pp.num_rows)]
            )
            for lvl in range(depth):
                neighbor = (column >> lvl) ^ 1
                transcript.write_hash(comm.tree[lvl][neighbor])

    @staticmethod
    def verify(vp: BrakedownParams, root: bytes, point: Sequence[int], eval_: int,
               transcript) -> None:
        row_len = vp.code.row_len
        codeword_len = vp.code.codeword_len

        t_0, t_1 = _point_to_tensor(vp.num_rows, point)
        combined_rows = []
        if vp.num_rows > 1:
            for _ in range(vp.code.num_proximity_testing):
                coeffs = transcript.squeeze_challenges(vp.num_rows)
                row = transcript.read_field_elements(row_len)
                enc = vp.code.encode(jnp.asarray(Fr.encode(row)))
                combined_rows.append((coeffs, [int(v) for v in Fr.decode(np.asarray(enc))]))
        row = transcript.read_field_elements(row_len)
        enc = vp.code.encode(jnp.asarray(Fr.encode(row)))
        combined_rows.append((t_0, [int(v) for v in Fr.decode(np.asarray(enc))]))

        depth = max((codeword_len - 1).bit_length(), 0)
        for _ in range(vp.code.num_column_opening):
            column = transcript.squeeze_challenge_idx(codeword_len)
            items = transcript.read_field_elements(vp.num_rows)
            path = [transcript.read_hash() for _ in range(depth)]

            for coeffs, encoded in combined_rows:
                item = (
                    sum(c * it for c, it in zip(coeffs, items)) % P
                    if vp.num_rows > 1
                    else items[0]
                )
                if item != encoded[column]:
                    raise PcsError("Brakedown proximity failure")

            h = Keccak256()
            for it in items:
                _hash_fe(h, it)
            output = h.digest()
            for lvl, neighbor in enumerate(path):
                h = Keccak256()
                if (column >> lvl) & 1 == 0:
                    h.update(output)
                    h.update(neighbor)
                else:
                    h.update(neighbor)
                    h.update(output)
                output = h.digest()
            if output != root:
                raise PcsError("Brakedown invalid merkle opening")

        t0_row = combined_rows[-1][1][:row_len]
        got = _consistency_eval(t0_row, t_1, row_len)
        if got != eval_ % P:
            raise PcsError("Brakedown consistency failure")

    @staticmethod
    def batch_open(pp, polys, comms, points, evals: Sequence[Evaluation], transcript):
        for ev in evals:
            MultilinearBrakedown.open(
                pp, polys[ev.poly], comms[ev.poly], points[ev.point], ev.value, transcript
            )

    @staticmethod
    def batch_verify(vp, roots, points, evals: Sequence[Evaluation], transcript):
        for ev in evals:
            MultilinearBrakedown.verify(
                vp, roots[ev.poly], points[ev.point], ev.value, transcript
            )


def _consistency_eval(t0_row: List[int], t_1: List[int], row_len: int) -> int:
    """inner_product(t_0_combined_row, t_1) where t_1 = eq(hi) over rows...
    NOTE: t_1 spans the ROW dimension of length row_len (lo part)."""
    acc = 0
    for a, b in zip(t0_row, t_1):
        acc = (acc + a * b) % P
    return acc


def _point_to_tensor(num_rows: int, point: Sequence[int]):
    """brakedown.rs point_to_tensor: (hi, lo) split; t_0 = eq(lo) (over rows),
    t_1 = eq(hi) (over row entries)."""
    import jax.numpy as _jnp

    k = len(point)
    log_rows = max(num_rows.bit_length() - 1, 0)
    hi = list(point[: k - log_rows])
    lo = list(point[k - log_rows :])

    def eq_host(y):
        if not y:
            return [1]
        arr = mle.eq_xy(Fr, _jnp.asarray(Fr.encode(y)))
        return [int(v) for v in Fr.decode(np.asarray(arr))]

    return eq_host(lo), eq_host(hi)
