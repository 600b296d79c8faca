"""Multilinear IPA (Bulletproofs-style log-round folding).

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/ipa.rs:
commit = MSM(evals, G); open: squeeze xi_0, h' = xi_0*H, then num_vars
rounds of L/R cross-commitments and (bases, coeffs, zs) folds with xi / xi^-1
(ipa.rs:170-241); verify recombines with the tensor-expanded h_coeffs poly
(ipa.rs:269-337).

Setup derives generators by try-and-increment hash-to-curve
(ops/curves.py:hash_to_curve), matching the reference's
C::CurveExt::hash_to_curve("MultilinearIpa::setup") (ipa.rs:105,123): no
party knows any discrete-log relation between the generators, which is what
makes the commitments binding. (SRS bytes still differ from the reference's,
as all SRS do.)
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import curves, ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.keccak import keccak256
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.pcs import Evaluation, PointCommitmentIO, additive_batch_open, additive_batch_verify
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.poly import multilinear as mle

P = Fr.modulus


@dataclasses.dataclass
class IpaParams:
    num_vars: int
    g: dict  # device point batch (2^k,)
    h: dict  # single point (scalar batch shape ())


class MultilinearIpa(PointCommitmentIO):
    """Generic over the catalogued curve: subclass and set CURVE/FIELD to
    instantiate over grumpkin (reference tests use MultilinearIpa<grumpkin>,
    hyperplonk.rs:422-423) — polynomials then live over the curve's scalar
    field (bn254 Fq)."""

    CURVE = curves.BN254_G1
    FIELD = Fr  # == CURVE.scalar: the polynomial / challenge field

    @classmethod
    def setup(cls, poly_size: int, rng=None) -> IpaParams:
        num_vars = poly_size.bit_length() - 1
        affine = curves.hash_to_curve(
            cls.CURVE, b"MultilinearIpa::setup", poly_size + 1
        )
        pts = ec.affine_to_jacobian(affine, cls.CURVE.base)
        g = {k: v[:poly_size] for k, v in pts.items()}
        h = {k: v[poly_size] for k, v in pts.items()}
        return IpaParams(num_vars=num_vars, g=g, h=h)

    @classmethod
    def trim(cls, param: IpaParams, poly_size: int):
        num_vars = poly_size.bit_length() - 1
        if param.num_vars < num_vars:
            raise PcsError("too many variates to trim")
        p = IpaParams(
            num_vars=num_vars, g={k: v[:poly_size] for k, v in param.g.items()}, h=param.h
        )
        return p, p

    @classmethod
    def commit(cls, pp: IpaParams, evals: jnp.ndarray) -> Tuple[int, int]:
        k = evals.shape[0].bit_length() - 1
        if k > pp.num_vars:
            raise PcsError("poly has too many variates")
        return ec.msm_to_affine_int(
            {kk: v[: evals.shape[0]] for kk, v in pp.g.items()},
            evals,
            cls.CURVE.base,
            cls.FIELD,
        )

    @classmethod
    def batch_commit(cls, pp, polys) -> List[Tuple[int, int]]:
        return [cls.commit(pp, p) for p in polys]

    @classmethod
    def sum_commitments(cls, scalars, bases) -> Tuple[int, int]:
        acc = None
        for sc, b in zip(scalars, bases):
            if sc % cls.FIELD.modulus == 0 or (b[0] == 0 and b[1] == 0):
                continue
            acc = curves.host_add(cls.CURVE, acc, curves.host_mul(cls.CURVE, b, sc))
        return (0, 0) if acc is None else acc

    @classmethod
    def _scale_points(cls, pts: dict, scalar: int) -> dict:
        """xi * pts for a host scalar, vectorized double-and-add."""
        n = pts["x"].shape[0]
        bits_int = scalar % cls.FIELD.modulus
        nbits = 254  # fixed width so the kernel compiles once per point count
        bits = jnp.asarray(
            np.tile(
                np.array([(bits_int >> i) & 1 for i in range(nbits)], dtype=np.uint32),
                (n, 1),
            )
        )
        return ec.scalar_mul_bits(pts, bits, cls.CURVE.base)

    @classmethod
    def open(cls, pp: IpaParams, evals: jnp.ndarray, point: Sequence[int], eval_, transcript) -> None:
        S = cls.FIELD
        B = cls.CURVE.base
        Pm = S.modulus
        num_vars = len(point)
        xi_0 = transcript.squeeze_challenge()
        h_prime = cls._scale_points({k: v[None] for k, v in pp.h.items()}, xi_0)

        bases = {k: v[: 1 << num_vars] for k, v in pp.g.items()}
        coeffs = evals
        zs = mle.eq_xy(S, jnp.asarray(S.encode(list(point))))

        for i in range(num_vars):
            mid = 1 << (num_vars - i - 1)
            b_l = {k: v[:mid] for k, v in bases.items()}
            b_r = {k: v[mid:] for k, v in bases.items()}
            c_l_arr = F.sum_reduce(S, F.mont_mul(S, coeffs[mid:], zs[:mid]))
            c_r_arr = F.sum_reduce(S, F.mont_mul(S, coeffs[:mid], zs[mid:]))
            # L_i = MSM(bases_l, coeffs_r) + c_l * h'
            l_pt = ec.ec_add(
                ec.variable_base_msm(b_l, coeffs[mid:], B, S),
                {k: v[0] for k, v in cls._scale_points(
                    h_prime, F.decode_scalar(S, np.asarray(c_l_arr))
                ).items()},
                B,
            )
            r_pt = ec.ec_add(
                ec.variable_base_msm(b_r, coeffs[:mid], B, S),
                {k: v[0] for k, v in cls._scale_points(
                    h_prime, F.decode_scalar(S, np.asarray(c_r_arr))
                ).items()},
                B,
            )
            l_aff = ec.jacobian_to_affine({k: v[None] for k, v in l_pt.items()}, B)
            r_aff = ec.jacobian_to_affine({k: v[None] for k, v in r_pt.items()}, B)
            transcript.write_commitment((int(l_aff[0, 0]), int(l_aff[0, 1])))
            transcript.write_commitment((int(r_aff[0, 0]), int(r_aff[0, 1])))

            xi = transcript.squeeze_challenge()
            xi_inv = pow(xi, -1, Pm)
            scaled_r = cls._scale_points(b_r, xi)
            bases = ec.ec_add(b_l, scaled_r, B)
            xi_d = jnp.asarray(S.encode([xi]))[0]
            xi_inv_d = jnp.asarray(S.encode([xi_inv]))[0]
            coeffs = F.add(S, coeffs[:mid], F.mont_mul(S, coeffs[mid:], xi_inv_d[None, :]))
            zs = F.add(S, zs[:mid], F.mont_mul(S, zs[mid:], xi_d[None, :]))

        transcript.write_field_element(F.decode_scalar(S, np.asarray(coeffs[0])))

    @classmethod
    def verify(cls, vp: IpaParams, comm, point: Sequence[int], eval_: int, transcript) -> None:
        S = cls.FIELD
        B = cls.CURVE.base
        Pm = S.modulus
        num_vars = len(point)
        xi_0 = transcript.squeeze_challenge()
        ls, rs, xis = [], [], []
        for _ in range(num_vars):
            ls.append(transcript.read_commitment())
            rs.append(transcript.read_commitment())
            xis.append(transcript.squeeze_challenge())
        neg_c = (-transcript.read_field_element()) % Pm

        # h_coeffs tensor: coeffs[b] = neg_c * prod_{i set in b} xi_{...}
        # (ipa.rs:319-337: duplicate left half scaled by xi, xi reversed)
        hc = [neg_c]
        for xi in reversed(xis):
            hc = hc + [c * xi % Pm for c in hc]
        hc_dev = jnp.asarray(S.encode(hc))
        neg_c_h_eval = int(
            S.decode(
                np.asarray(
                    mle.evaluate(S, hc_dev, jnp.asarray(S.encode(list(point))))
                )[None]
            )[0]
        )
        u = xi_0 * ((neg_c_h_eval + eval_) % Pm) % Pm

        # MSM check: sum xi_inv_i L_i + sum xi_i R_i + MSM(g, hc) + u*h + comm == O
        acc = None
        for l_c, xi in zip(ls, xis):
            acc = curves.host_add(
                cls.CURVE, acc, curves.host_mul(cls.CURVE, l_c, pow(xi, -1, Pm))
            )
        for r_c, xi in zip(rs, xis):
            acc = curves.host_add(cls.CURVE, acc, curves.host_mul(cls.CURVE, r_c, xi))
        g_part = ec.msm_to_affine_int(
            {k: v[: 1 << num_vars] for k, v in vp.g.items()}, hc_dev, B, S
        )
        if g_part != (0, 0):
            acc = curves.host_add(cls.CURVE, acc, g_part)
        h_aff = ec.jacobian_to_affine({k: v[None] for k, v in vp.h.items()}, B)
        h_pt = (int(h_aff[0, 0]), int(h_aff[0, 1]))
        if u:
            acc = curves.host_add(cls.CURVE, acc, curves.host_mul(cls.CURVE, h_pt, u))
        if comm != (0, 0):
            acc = curves.host_add(cls.CURVE, acc, comm)
        if acc is not None and acc != (0, 0):
            raise PcsError("invalid multilinear IPA open")

    @classmethod
    def batch_open(cls, pp, polys, comms, points, evals, transcript):
        additive_batch_open(cls, pp, pp.num_vars, polys, points, evals, transcript)

    @classmethod
    def batch_verify(cls, vp, comms, points, evals, transcript):
        additive_batch_verify(cls, vp, vp.num_vars, comms, points, evals, transcript)


class MultilinearIpaGrumpkin(MultilinearIpa):
    """IPA over the grumpkin half of the BN254 2-cycle: coordinates in
    bn254 Fr, polynomials over bn254 Fq (hyperplonk.rs:422-423 parity)."""

    CURVE = curves.GRUMPKIN
    FIELD = Fq
