"""Multilinear KZG (PST13-style), the primary PCS of the TPU build.

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/kzg.rs:
  * SRS: random s_1..s_k; G1 tables eqs[j] = { eq(b; s_1..s_j) * G1 } for all
    j <= k (kzg.rs:166-228; bit i of b pairs with s_{i+1}, identical to our
    eq_xy layout); G2 points s_i * G2.
  * commit = MSM(evals, eqs[num_vars]) (kzg.rs:252-257).
  * open at x: the k quotient polys of f - f(x) against (X_i - x_i), each
    committed with the size-matched eq table; quotient extraction is just a
    chain of `fix_last_var` folds (pcs/multilinear.rs:72-107), so it rides
    the same fused device kernel as the sumcheck.
  * verify: e(C - eval*G1, -G2) * prod_i e(Q_i, (s_i - x_i) G2) == 1
    (kzg.rs:330-361), on host (one multi-pairing per proof).

TPU design notes: SRS G1 tables are generated on device by a vectorized
double-and-add over all 2^(k+1)-2 scalars at once (replacing the reference's
windowed host tables, msm.rs:16-65) and cached as Jacobian limb arrays ready
for the Pippenger MSM kernel.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops import pairing as hostec
from halo2_lasso_tpu.ops.bn254 import Fr, G2_GEN_X, G2_GEN_Y
from halo2_lasso_tpu.pcs import (
    Evaluation,
    PointCommitmentIO,
    additive_batch_open,
    additive_batch_verify,
)
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript

G2_GEN = (G2_GEN_X, G2_GEN_Y)


from halo2_lasso_tpu.errors import Halo2LassoError


class PcsError(Halo2LassoError):
    pass


@dataclasses.dataclass
class KzgParams:
    g1: Tuple[int, int]
    eqs: List[dict]  # eqs[j]: device Jacobian point batch of size 2^j
    g2: Tuple
    ss: List[Tuple]  # s_i * G2 affine (Fq2 coeff tuples)


@dataclasses.dataclass
class KzgProverParams:
    g1: Tuple[int, int]
    eqs: List[dict]

    @property
    def num_vars(self):
        return len(self.eqs) - 1


@dataclasses.dataclass
class KzgVerifierParams:
    g1: Tuple[int, int]
    g2: Tuple
    ss: List[Tuple]

    @property
    def num_vars(self):
        return len(self.ss)


class MultilinearKzg(PointCommitmentIO):
    """Namespace-style PCS implementation (stateless classmethods)."""

    @staticmethod
    def setup(poly_size: int, rng: np.random.RandomState) -> KzgParams:
        assert poly_size & (poly_size - 1) == 0
        num_vars = poly_size.bit_length() - 1
        ss = [int.from_bytes(rng.bytes(40), "little") % Fr.modulus for _ in range(num_vars)]

        # all eq tables concatenated: sizes 1, 2, ..., 2^k
        tables = [np.array([1], dtype=object)]
        for j in range(1, num_vars + 1):
            sd = jnp.asarray(Fr.encode(ss[:j]))
            tbl = Fr.decode(np.asarray(mle.eq_xy(Fr, sd)))
            tables.append(tbl)
        all_scalars = np.concatenate([t.reshape(-1) for t in tables])
        scal_dev = jnp.asarray(Fr.encode(all_scalars))
        g1 = ec.g1_generator()
        pts = ec.fixed_base_msm(g1, scal_dev, 256)
        # split back into per-size tables
        eqs = []
        off = 0
        for j in range(num_vars + 1):
            n = 1 << j
            eqs.append({k: v[off : off + n] for k, v in pts.items()})
            off += n

        ss_g2 = [hostec.g2_mul(G2_GEN, s) for s in ss]
        from halo2_lasso_tpu.ops.bn254 import G1_GEN

        return KzgParams(g1=G1_GEN, eqs=eqs, g2=G2_GEN, ss=ss_g2)

    @staticmethod
    def trim(param: KzgParams, poly_size: int) -> Tuple[KzgProverParams, KzgVerifierParams]:
        num_vars = poly_size.bit_length() - 1
        if len(param.eqs) - 1 < num_vars:
            raise PcsError(
                f"too many variates to trim (supports up to {len(param.eqs)-1}, got {num_vars})"
            )
        return (
            KzgProverParams(g1=param.g1, eqs=param.eqs[: num_vars + 1]),
            KzgVerifierParams(g1=param.g1, g2=param.g2, ss=param.ss[:num_vars]),
        )

    @staticmethod
    def commit(pp: KzgProverParams, evals: jnp.ndarray) -> Tuple[int, int]:
        """evals: (2^k, L) Montgomery device array -> affine commitment."""
        k = evals.shape[0].bit_length() - 1
        if k > pp.num_vars:
            raise PcsError("poly has too many variates for params")
        return ec.msm_to_affine_int(pp.eqs[k], evals)

    @staticmethod
    def batch_commit(pp: KzgProverParams, polys: Sequence[jnp.ndarray]) -> List[Tuple[int, int]]:
        if not polys:
            return []
        sizes = {p.shape[0] for p in polys}
        if len(sizes) == 1:
            k = next(iter(sizes)).bit_length() - 1
            if k > pp.num_vars:
                raise PcsError("poly has too many variates for params")
            out = ec.batch_msm(pp.eqs[k], jnp.stack(list(polys)))
            return [(int(x), int(y)) for x, y in out]
        return [MultilinearKzg.commit(pp, poly) for poly in polys]

    @staticmethod
    def quotient_polys(evals: jnp.ndarray, point: Sequence[int]):
        """Quotients of f - f(x) against (X_i - x_i), highest variable first;
        returns ([(num_vars_i, quotient_array)] ordered by increasing i,
        remainder_eval_array). pcs/multilinear.rs:72-107 semantics."""
        spec = Fr
        k = evals.shape[0].bit_length() - 1
        assert len(point) == k
        xd = jnp.asarray(spec.encode(list(point)))
        rem = evals
        quotients = []
        for i in range(k - 1, -1, -1):
            n = 1 << i
            lo, hi = rem[:n], rem[n:]
            quotients.append((i, F.sub(spec, hi, lo)))
            rem = mle.fix_last_var(spec, rem, xd[i])
        quotients.reverse()
        return quotients, rem[0]

    @staticmethod
    def open(
        pp: KzgProverParams,
        evals: jnp.ndarray,
        point: Sequence[int],
        eval_: Optional[int],
        transcript: Keccak256Transcript,
    ) -> None:
        from halo2_lasso_tpu.utils.timer import timed

        with timed.scope("kzg_quotient_polys"):
            quotients, _rem = MultilinearKzg.quotient_polys(evals, point)
        from halo2_lasso_tpu.config import sanity_enabled

        if sanity_enabled() and eval_ is not None:
            # kzg.rs:286-289: the division remainder is the claimed eval
            got = F.decode_scalar(Fr, np.asarray(_rem))
            assert got == eval_ % Fr.modulus, "kzg open remainder != claimed eval"
        # all k quotient MSMs dispatch async with a single host pull
        with timed.scope("kzg_quotient_msms"):
            comms = ec.msm_list_to_affine_int([(pp.eqs[i], q) for i, q in quotients])
        transcript.write_commitments(comms)

    @staticmethod
    def verify(
        vp: KzgVerifierParams,
        comm: Tuple[int, int],
        point: Sequence[int],
        eval_: int,
        transcript: Keccak256Transcript,
    ) -> None:
        k = len(point)
        quotients = transcript.read_commitments(k)
        p = Fr.modulus
        # lhs_0 = comm - eval * g1
        lhs0 = hostec._add(
            None if comm == (0, 0) else comm,
            hostec._neg(hostec.g1_mul_host(vp.g1, eval_ % p)) if eval_ % p else None,
        )
        # rhs_0 = -g2 ; rhs_i = (s_i - x_i) * g2
        terms = []
        neg_g2 = (vp.g2[0], tuple((-c) % hostec.P for c in vp.g2[1]))
        terms.append((lhs0, neg_g2))
        for i in range(k):
            s_g2 = vp.ss[i]
            x_g2 = hostec.g2_mul(vp.g2, point[i] % p) if point[i] % p else None
            diff = _g2_sub(s_g2, x_g2)
            q = quotients[i]
            terms.append((None if q == (0, 0) else q, diff))
        if not hostec.multi_pairing_is_one(
            [(t0, t1) for t0, t1 in terms if t0 is not None and t1 is not None]
        ):
            raise PcsError("invalid multilinear KZG open")

    # ---- batch ----

    @staticmethod
    def batch_open(pp, polys, comms, points, evals: Sequence[Evaluation], transcript):
        # size by the opened points (polys may be smaller than the params)
        num_vars = len(points[0]) if points else pp.num_vars
        additive_batch_open(MultilinearKzg, pp, num_vars, polys, points, evals, transcript)

    @staticmethod
    def batch_verify(vp, comms, points, evals: Sequence[Evaluation], transcript):
        num_vars = len(points[0]) if points else vp.num_vars
        additive_batch_verify(MultilinearKzg, vp, num_vars, comms, points, evals, transcript)


def _g2_sub(a, b):
    """a - b for host G2 affine points in Fq2-coeff-tuple form (None = id)."""
    pa = None if a is None else (hostec.fq2(*a[0]), hostec.fq2(*a[1]))
    pb = None if b is None else (hostec.fq2(*b[0]), hostec.fq2(*b[1]))
    out = hostec._add(pa, hostec._neg(pb) if pb is not None else None)
    if out is None:
        return None
    return (tuple(out[0].coeffs), tuple(out[1].coeffs))
