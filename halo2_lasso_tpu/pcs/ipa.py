"""Multilinear IPA (Bulletproofs-style log-round folding).

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/ipa.rs:
commit = MSM(evals, G); open: squeeze xi_0, h' = xi_0*H, then num_vars
rounds of L/R cross-commitments and (bases, coeffs, zs) folds with xi / xi^-1
(ipa.rs:170-241); verify recombines with the tensor-expanded h_coeffs poly
(ipa.rs:269-337).

Setup note: the reference derives generators by hash-to-curve
(ipa.rs:98-127); here generators are s_i*G1 with s_i = keccak(seed, i) mod r
— an equivalent-security transparent derivation that keeps SRS generation on
the device MSM path (SRS bytes differ from the reference's, as all SRS do).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.keccak import keccak256
from halo2_lasso_tpu.ops.bn254 import Fr
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
    @staticmethod
    def setup(poly_size: int, rng=None) -> IpaParams:
        num_vars = poly_size.bit_length() - 1
        scalars = [
            int.from_bytes(keccak256(b"MultilinearIpa::setup" + i.to_bytes(4, "little")), "little") % P
            for i in range(poly_size + 1)
        ]
        pts = ec.fixed_base_msm(ec.g1_generator(), jnp.asarray(Fr.encode(scalars)), 256)
        g = {k: v[:poly_size] for k, v in pts.items()}
        h = {k: v[poly_size] for k, v in pts.items()}
        return IpaParams(num_vars=num_vars, g=g, h=h)

    @staticmethod
    def trim(param: IpaParams, poly_size: int):
        num_vars = poly_size.bit_length() - 1
        if param.num_vars < num_vars:
            raise PcsError("too many variates to trim")
        p = IpaParams(
            num_vars=num_vars, g={k: v[:poly_size] for k, v in param.g.items()}, h=param.h
        )
        return p, p

    @staticmethod
    def commit(pp: IpaParams, evals: jnp.ndarray) -> Tuple[int, int]:
        k = evals.shape[0].bit_length() - 1
        if k > pp.num_vars:
            raise PcsError("poly has too many variates")
        return ec.msm_to_affine_int({kk: v[: evals.shape[0]] for kk, v in pp.g.items()}, evals)

    @staticmethod
    def batch_commit(pp, polys) -> List[Tuple[int, int]]:
        return [MultilinearIpa.commit(pp, p) for p in polys]

    @staticmethod
    def _scale_points(pts: dict, scalar: int) -> dict:
        """xi * pts for a host scalar, vectorized double-and-add."""
        n = pts["x"].shape[0]
        bits_int = scalar % P
        nbits = 254  # fixed width so the kernel compiles once per point count
        bits = jnp.asarray(
            np.tile(
                np.array([(bits_int >> i) & 1 for i in range(nbits)], dtype=np.uint32),
                (n, 1),
            )
        )
        return ec.scalar_mul_bits(pts, bits)

    @staticmethod
    def open(pp: IpaParams, evals: jnp.ndarray, point: Sequence[int], eval_, transcript) -> None:
        num_vars = len(point)
        xi_0 = transcript.squeeze_challenge()
        h_prime = MultilinearIpa._scale_points(
            {k: v[None] for k, v in pp.h.items()}, xi_0
        )

        bases = {k: v[: 1 << num_vars] for k, v in pp.g.items()}
        coeffs = evals
        zs = mle.eq_xy(Fr, jnp.asarray(Fr.encode(list(point))))

        for i in range(num_vars):
            mid = 1 << (num_vars - i - 1)
            b_l = {k: v[:mid] for k, v in bases.items()}
            b_r = {k: v[mid:] for k, v in bases.items()}
            c_l_arr = F.sum_reduce(Fr, F.mont_mul(Fr, coeffs[mid:], zs[:mid]))
            c_r_arr = F.sum_reduce(Fr, F.mont_mul(Fr, coeffs[:mid], zs[mid:]))
            # L_i = MSM(bases_l, coeffs_r) + c_l * h'
            l_pt = ec.ec_add(
                ec.variable_base_msm(b_l, coeffs[mid:]),
                {k: v[0] for k, v in MultilinearIpa._scale_points(
                    h_prime, F.decode_scalar(Fr, np.asarray(c_l_arr))
                ).items()},
            )
            r_pt = ec.ec_add(
                ec.variable_base_msm(b_r, coeffs[:mid]),
                {k: v[0] for k, v in MultilinearIpa._scale_points(
                    h_prime, F.decode_scalar(Fr, np.asarray(c_r_arr))
                ).items()},
            )
            l_aff = ec.jacobian_to_affine({k: v[None] for k, v in l_pt.items()})
            r_aff = ec.jacobian_to_affine({k: v[None] for k, v in r_pt.items()})
            transcript.write_commitment((int(l_aff[0, 0]), int(l_aff[0, 1])))
            transcript.write_commitment((int(r_aff[0, 0]), int(r_aff[0, 1])))

            xi = transcript.squeeze_challenge()
            xi_inv = pow(xi, -1, P)
            scaled_r = MultilinearIpa._scale_points(b_r, xi)
            bases = ec.ec_add(b_l, scaled_r)
            xi_d = jnp.asarray(Fr.encode([xi]))[0]
            xi_inv_d = jnp.asarray(Fr.encode([xi_inv]))[0]
            coeffs = F.add(Fr, coeffs[:mid], F.mont_mul(Fr, coeffs[mid:], xi_inv_d[None, :]))
            zs = F.add(Fr, zs[:mid], F.mont_mul(Fr, zs[mid:], xi_d[None, :]))

        transcript.write_field_element(F.decode_scalar(Fr, np.asarray(coeffs[0])))

    @staticmethod
    def verify(vp: IpaParams, comm, point: Sequence[int], eval_: int, transcript) -> None:
        num_vars = len(point)
        xi_0 = transcript.squeeze_challenge()
        ls, rs, xis = [], [], []
        for _ in range(num_vars):
            ls.append(transcript.read_commitment())
            rs.append(transcript.read_commitment())
            xis.append(transcript.squeeze_challenge())
        neg_c = (-transcript.read_field_element()) % P

        # h_coeffs tensor: coeffs[b] = neg_c * prod_{i set in b} xi_{...}
        # (ipa.rs:319-337: duplicate left half scaled by xi, xi reversed)
        hc = [neg_c]
        for xi in reversed(xis):
            hc = hc + [c * xi % P for c in hc]
        hc_dev = jnp.asarray(Fr.encode(hc))
        neg_c_h_eval = int(
            Fr.decode(
                np.asarray(
                    mle.evaluate(Fr, hc_dev, jnp.asarray(Fr.encode(list(point))))
                )[None]
            )[0]
        )
        u = xi_0 * ((neg_c_h_eval + eval_) % P) % P

        # MSM check: sum xi_inv_i L_i + sum xi_i R_i + MSM(g, hc) + u*h + comm == O
        from halo2_lasso_tpu.ops import pairing as hostec

        acc = None
        for l_c, xi in zip(ls, xis):
            acc = hostec._add(acc, hostec._mul(l_c, pow(xi, -1, P)))
        for r_c, xi in zip(rs, xis):
            acc = hostec._add(acc, hostec._mul(r_c, xi))
        g_part = ec.msm_to_affine_int(
            {k: v[: 1 << num_vars] for k, v in vp.g.items()}, hc_dev
        )
        if g_part != (0, 0):
            acc = hostec._add(acc, g_part)
        h_aff = ec.jacobian_to_affine({k: v[None] for k, v in vp.h.items()})
        h_pt = (int(h_aff[0, 0]), int(h_aff[0, 1]))
        if u:
            acc = hostec._add(acc, hostec._mul(h_pt, u))
        if comm != (0, 0):
            acc = hostec._add(acc, comm)
        if acc is not None:
            raise PcsError("invalid multilinear IPA open")

    @staticmethod
    def batch_open(pp, polys, comms, points, evals, transcript):
        additive_batch_open(MultilinearIpa, pp, pp.num_vars, polys, points, evals, transcript)

    @staticmethod
    def batch_verify(vp, comms, points, evals, transcript):
        additive_batch_verify(MultilinearIpa, vp, vp.num_vars, comms, points, evals, transcript)
