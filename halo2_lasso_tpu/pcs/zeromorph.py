"""Zeromorph: multilinear-to-univariate KZG via degree-offset quotients.

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/
zeromorph.rs: commit evals as univariate coeffs; open commits the k
multilinear quotients (same fix_last_var fold as multilinear KZG), batches
them into q_hat with y-powers at degree offsets, and proves the combined
polynomial vanishes at x with a degree-shifted SRS; verify is a 2-pairing
check against s_offset_g2 (zeromorph.rs:242-248).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops import pairing as hostec
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import (
    Evaluation,
    PointCommitmentIO,
    additive_batch_open,
    additive_batch_verify,
    g1_sum_with_scalar,
)
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg, PcsError
from halo2_lasso_tpu.pcs.univariate_kzg import (
    UniKzgProverParams,
    UnivariateKzg,
)
from halo2_lasso_tpu.poly import univariate as uni

P = Fr.modulus


class ZeromorphProverParams:
    def __init__(self, commit_pp: UniKzgProverParams, open_pp: UniKzgProverParams):
        self.commit_pp = commit_pp
        self.open_pp = open_pp

    @property
    def num_vars(self):
        return (self.commit_pp.powers_g1["x"].shape[0]).bit_length() - 1


class ZeromorphVerifierParams:
    def __init__(self, vp, s_offset_g2):
        self.vp = vp
        self.s_offset_g2 = s_offset_g2


class Zeromorph(PointCommitmentIO):
    setup = staticmethod(UnivariateKzg.setup)

    @staticmethod
    def trim(param, poly_size: int):
        commit_pp, vp = UnivariateKzg.trim(param, poly_size)
        max_size = param.powers_g1["x"].shape[0]
        offset = max_size - poly_size
        open_pp = UniKzgProverParams(
            powers_g1={k: v[offset:] for k, v in param.powers_g1.items()}
        )
        s_offset_g2 = param.s_g2_offsets.get(offset)
        if s_offset_g2 is None:
            raise PcsError("setup lacks s^offset G2 for this trim size")
        return (
            ZeromorphProverParams(commit_pp, open_pp),
            ZeromorphVerifierParams(vp, s_offset_g2),
        )

    @staticmethod
    def commit(pp: ZeromorphProverParams, evals: jnp.ndarray) -> Tuple[int, int]:
        return UnivariateKzg.commit(pp.commit_pp, evals)

    @staticmethod
    def batch_commit(pp, polys) -> List[Tuple[int, int]]:
        return [Zeromorph.commit(pp, p) for p in polys]

    @staticmethod
    def open(pp: ZeromorphProverParams, evals, point, eval_, transcript) -> None:
        num_vars = len(point)
        quotients, rem = MultilinearKzg.quotient_polys(evals, point)
        q_comms = [UnivariateKzg.commit(pp.commit_pp, q) for _, q in quotients]
        transcript.write_commitments(q_comms)
        if eval_ is None:
            eval_ = F.decode_scalar(Fr, np.asarray(rem))

        y = transcript.squeeze_challenge()

        # q_hat = sum_i y^i * X^{2^n - 2^i} * q_i  (degree-offset batching)
        n = 1 << num_vars
        q_hat = jnp.zeros((n, Fr.num_limbs), dtype=jnp.uint32)
        py = 1
        for i, (nv_i, q) in enumerate(quotients):
            offset = n - (1 << nv_i)
            term = F.mont_mul(Fr, q, jnp.asarray(Fr.encode([py]))[0][None, :])
            q_hat = q_hat.at[offset:].set(F.add(Fr, q_hat[offset:], term))
            py = py * y % P
        transcript.write_commitment(UnivariateKzg.commit(pp.commit_pp, q_hat))

        x = transcript.squeeze_challenge()
        z = transcript.squeeze_challenge()
        eval_scalar, q_scalars = _eval_and_quotient_scalars(y, x, z, list(point))

        f = F.mont_mul(Fr, evals, jnp.asarray(Fr.encode([z]))[0][None, :])
        f = F.add(Fr, f, q_hat)
        f0_add = eval_scalar * eval_ % P
        f = f.at[0].set(
            F.add(Fr, f[0:1], jnp.asarray(Fr.encode([f0_add])))[0]
        )
        for (nv_i, q), sc in zip(quotients, q_scalars):
            term = F.mont_mul(Fr, q, jnp.asarray(Fr.encode([sc]))[0][None, :])
            f = f.at[: term.shape[0]].set(F.add(Fr, f[: term.shape[0]], term))

        UnivariateKzg.open(pp.open_pp, f, x, 0, transcript)

    @staticmethod
    def verify(vp: ZeromorphVerifierParams, comm, point, eval_, transcript) -> None:
        num_vars = len(point)
        q_comms = transcript.read_commitments(num_vars)
        y = transcript.squeeze_challenge()
        q_hat_comm = transcript.read_commitment()
        x = transcript.squeeze_challenge()
        z = transcript.squeeze_challenge()

        eval_scalar, q_scalars = _eval_and_quotient_scalars(y, x, z, list(point))
        scalars = [1, z, eval_scalar * eval_ % P] + q_scalars
        bases = [q_hat_comm, comm, vp.vp.g1] + q_comms
        c = g1_sum_with_scalar(scalars, bases)

        pi = transcript.read_commitment()
        # e(c, -s^offset g2) * e(pi, s*g2 - x*g2) == 1
        neg_off = (vp.s_offset_g2[0], tuple((-v) % hostec.P for v in vp.s_offset_g2[1]))
        from halo2_lasso_tpu.pcs.multilinear_kzg import _g2_sub

        x_g2 = hostec.g2_mul(vp.vp.g2, x % P) if x % P else None
        diff = _g2_sub(vp.vp.s_g2, x_g2)
        terms = []
        if c != (0, 0):
            terms.append((c, neg_off))
        terms.append((pi, diff))
        if not hostec.multi_pairing_is_one(terms):
            raise PcsError("invalid Zeromorph KZG open")

    @staticmethod
    def batch_open(pp, polys, comms, points, evals, transcript):
        num_vars = len(points[0]) if points else 0
        additive_batch_open(Zeromorph, pp, num_vars, polys, points, evals, transcript)

    @staticmethod
    def batch_verify(vp, comms, points, evals, transcript):
        num_vars = len(points[0]) if points else 0
        additive_batch_verify(Zeromorph, vp, num_vars, comms, points, evals, transcript)


def _eval_and_quotient_scalars(y: int, x: int, z: int, u: Sequence[int]):
    """zeromorph.rs:263-299 (host ints)."""
    num_vars = len(u)
    squares_of_x = []
    sq = x
    for _ in range(num_vars + 1):
        squares_of_x.append(sq)
        sq = sq * sq % P
    # offsets_of_x[i] = prod_{j > i} x^{2^j} ... built by reverse scan of
    # squares_of_x[..num_vars] reversed, skipping the last
    offsets = []
    state = 1
    for pw in reversed(squares_of_x[:num_vars]):
        state = state * pw % P
        offsets.append(state)
    offsets.reverse()
    v_numer = (squares_of_x[num_vars] - 1) % P
    vs = [v_numer * pow((s - 1) % P, -1, P) % P for s in squares_of_x]
    q_scalars = []
    py = 1
    for i in range(num_vars):
        q_scalars.append(
            (-(py * offsets[i] + z * (squares_of_x[i] * vs[i + 1] - u[i] * vs[i]))) % P
        )
        py = py * y % P
    return (-vs[0] * z) % P, q_scalars
