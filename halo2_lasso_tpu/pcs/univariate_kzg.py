"""Univariate KZG with fflonk-style multi-point batch opening.

Semantics mirror /root/reference/plonkish_backend/src/pcs/univariate/kzg.rs:
setup = powers-of-s G1 tables (+ s*G2); commit = MSM over coefficients;
open = commit (f - f(z))/(X - z); verify = 2-pairing check
  e(pi*z + C - eval*G1, -G2) * e(pi, s*G2) == 1  (kzg.rs:366-378);
batch open groups evals into same-point-set `eval_sets` (kzg.rs:454-512),
batches with beta/gamma powers, commits the combined quotient q, and opens
the normalized linear combination at a fresh z (kzg.rs:301-354).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops import pairing as hostec
from halo2_lasso_tpu.ops.bn254 import Fr, G1_GEN, G2_GEN_X, G2_GEN_Y
from halo2_lasso_tpu.pcs import Evaluation, g1_sum_with_scalar
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.poly import univariate as uni
from halo2_lasso_tpu.piop.sum_check import barycentric_weights, barycentric_interpolate

G2_GEN = (G2_GEN_X, G2_GEN_Y)
P = Fr.modulus


@dataclasses.dataclass
class UniKzgParams:
    powers_g1: dict  # device point batch (n,)
    g2: Tuple
    s_g2: Tuple
    # s^(max_size - 2^j) * G2 per power-of-two trim size (for Zeromorph's
    # degree-shifted opens; kzg.rs stores all powers_of_s_g2, we store the
    # log-many offsets actually consumed by trim)
    s_g2_offsets: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class UniKzgProverParams:
    powers_g1: dict

    @property
    def degree(self):
        return self.powers_g1["x"].shape[0] - 1


@dataclasses.dataclass
class UniKzgVerifierParams:
    g1: Tuple[int, int]
    g2: Tuple
    s_g2: Tuple


class UnivariateKzg:
    @staticmethod
    def setup(poly_size: int, rng: np.random.RandomState) -> UniKzgParams:
        s = int.from_bytes(rng.bytes(40), "little") % P
        scalars = []
        acc = 1
        for _ in range(poly_size):
            scalars.append(acc)
            acc = acc * s % P
        g1 = ec.g1_generator()
        pts = ec.fixed_base_msm(g1, jnp.asarray(Fr.encode(scalars)), 256)
        s_g2 = hostec.g2_mul(G2_GEN, s)
        s_g2_offsets = {0: G2_GEN}
        size = 1
        while size <= poly_size:
            off = poly_size - size
            s_g2_offsets[off] = hostec.g2_mul(G2_GEN, pow(s, off, P)) if off else G2_GEN
            size <<= 1
        return UniKzgParams(
            powers_g1=pts, g2=G2_GEN, s_g2=s_g2, s_g2_offsets=s_g2_offsets
        )

    @staticmethod
    def trim(param: UniKzgParams, poly_size: int):
        if param.powers_g1["x"].shape[0] < poly_size:
            raise PcsError("too large poly_size to trim")
        pp = UniKzgProverParams(
            powers_g1={k: v[:poly_size] for k, v in param.powers_g1.items()}
        )
        vp = UniKzgVerifierParams(g1=G1_GEN, g2=param.g2, s_g2=param.s_g2)
        return pp, vp

    @staticmethod
    def commit(pp: UniKzgProverParams, coeffs: jnp.ndarray) -> Tuple[int, int]:
        n = coeffs.shape[0]
        if n > pp.powers_g1["x"].shape[0]:
            raise PcsError("poly degree exceeds params")
        pts = {k: v[:n] for k, v in pp.powers_g1.items()}
        return ec.msm_to_affine_int(pts, coeffs)

    @staticmethod
    def open(pp, coeffs: jnp.ndarray, point: int, eval_: int, transcript) -> None:
        zd = jnp.asarray(Fr.encode([point]))[0]
        q, _r = uni.div_by_linear(Fr, coeffs, zd)
        transcript.write_commitment(UnivariateKzg.commit(pp, q))

    @staticmethod
    def verify(vp, comm: Tuple[int, int], point: int, eval_: int, transcript) -> None:
        pi = transcript.read_commitment()
        # c = pi * z + comm - eval * g1
        c = hostec._mul(pi, point % P) if point % P else None
        if comm != (0, 0):
            c = hostec._add(c, comm)
        if eval_ % P:
            c = hostec._add(c, hostec._neg(hostec.g1_mul_host(vp.g1, eval_ % P)))
        neg_g2 = (vp.g2[0], tuple((-v) % hostec.P for v in vp.g2[1]))
        terms = []
        if c is not None:
            terms.append((c, neg_g2))
        terms.append((pi, vp.s_g2))
        if not hostec.multi_pairing_is_one(terms):
            raise PcsError("invalid univariate KZG open")

    # ---- fflonk-style batch ----

    @staticmethod
    def batch_open(
        pp, polys: Sequence[jnp.ndarray], points: Sequence[int],
        evals: Sequence[Evaluation], transcript,
    ) -> None:
        sets, superset = _eval_sets(evals)
        beta = transcript.squeeze_challenge()
        gamma = transcript.squeeze_challenge()

        max_set_len = max(len(s["polys"]) for s in sets)
        pow_beta = [pow(beta, i, P) for i in range(max_set_len)]
        pow_gamma = [pow(gamma, i, P) for i in range(len(sets))]

        fs, qs = [], []
        for s in sets:
            roots = [points[i] for i in s["points"]]
            f = None
            for pb, poly_idx in zip(pow_beta, s["polys"]):
                term = F.mont_mul(
                    Fr, polys[poly_idx], jnp.asarray(Fr.encode([pb]))[0][None, :]
                )
                f = term if f is None else uni.add_padded(Fr, f, term)
            q, _ = uni.div_rem_by_vanishing(Fr, f, roots)
            fs.append(f)
            qs.append(q)
        q_comb = None
        for pg, q in zip(pow_gamma, qs):
            term = F.mont_mul(Fr, q, jnp.asarray(Fr.encode([pg]))[0][None, :])
            q_comb = term if q_comb is None else uni.add_padded(Fr, q_comb, term)

        transcript.write_commitment(UnivariateKzg.commit(pp, q_comb))
        z = transcript.squeeze_challenge()

        normalized_scalars, normalizer = _set_scalars(sets, pow_gamma, points, z)
        superset_eval = 1
        for i in superset:
            superset_eval = superset_eval * (z - points[i]) % P
        q_scalar = (-superset_eval * normalizer) % P

        f_comb = None
        for ns, f in zip(normalized_scalars, fs):
            term = F.mont_mul(Fr, f, jnp.asarray(Fr.encode([ns]))[0][None, :])
            f_comb = term if f_comb is None else uni.add_padded(Fr, f_comb, term)
        f_comb = uni.add_padded(
            Fr,
            f_comb,
            F.mont_mul(Fr, q_comb, jnp.asarray(Fr.encode([q_scalar]))[0][None, :]),
        )
        UnivariateKzg.open(pp, f_comb, z, 0, transcript)

    @staticmethod
    def batch_verify(
        vp, comms: Sequence[Tuple[int, int]], points: Sequence[int],
        evals: Sequence[Evaluation], transcript,
    ) -> None:
        sets, superset = _eval_sets(evals)
        beta = transcript.squeeze_challenge()
        gamma = transcript.squeeze_challenge()
        q_comm = transcript.read_commitment()
        z = transcript.squeeze_challenge()

        max_set_len = max(len(s["polys"]) for s in sets)
        pow_beta = [pow(beta, i, P) for i in range(max_set_len)]
        pow_gamma = [pow(gamma, i, P) for i in range(len(sets))]
        normalized_scalars, normalizer = _set_scalars(sets, pow_gamma, points, z)

        scalars = [0] * len(comms)
        for s, coeff in zip(sets, normalized_scalars):
            for poly_idx, pb in zip(s["polys"], pow_beta):
                scalars[poly_idx] = coeff * pb % P
        superset_eval = 1
        for i in superset:
            superset_eval = superset_eval * (z - points[i]) % P
        q_scalar = (-superset_eval * normalizer) % P
        f_comm = g1_sum_with_scalar(
            scalars + [q_scalar], list(comms) + [q_comm]
        )

        eval_ = 0
        for s, ns in zip(sets, normalized_scalars):
            pts = [points[i] for i in s["points"]]
            ws = barycentric_weights(P, pts)
            r_evals = [
                barycentric_interpolate(P, ws, pts, row, z) for row in s["evals"]
            ]
            r_eval = sum(pb * rv for pb, rv in zip(pow_beta, r_evals)) % P
            eval_ = (eval_ + ns * r_eval) % P
        UnivariateKzg.verify(vp, f_comm, z, eval_, transcript)


def _eval_sets(evals: Sequence[Evaluation]):
    """kzg.rs:454-512: group polys by their point sets."""
    poly_shifts: List = []
    superset: List[int] = []
    for ev in evals:
        entry = next((e for e in poly_shifts if e[0] == ev.poly), None)
        if entry is None:
            poly_shifts.append((ev.poly, [ev.point], [ev.value]))
        else:
            if ev.point not in entry[1]:
                entry[1].append(ev.point)
                entry[2].append(ev.value)
        if ev.point not in superset:
            superset.append(ev.point)
    superset = sorted(superset)

    sets: List[dict] = []
    for poly, pts, vals in poly_shifts:
        match = next((s for s in sets if set(s["points"]) == set(pts)), None)
        if match is not None:
            if poly not in match["polys"]:
                match["polys"].append(poly)
                match["evals"].append(
                    [vals[pts.index(lhs)] for lhs in match["points"]]
                )
        else:
            diffs = [i for i in superset if i not in pts]
            sets.append(
                {"polys": [poly], "points": pts, "diffs": diffs, "evals": [vals]}
            )
    return sets, superset


def _set_scalars(sets, pow_gamma, points, z):
    """kzg.rs:514-539."""
    vdiff_evals = []
    for s in sets:
        acc = 1
        for i in s["diffs"]:
            acc = acc * (z - points[i]) % P
        vdiff_evals.append(acc)
    normalizer = pow(vdiff_evals[0], -1, P) if vdiff_evals[0] % P else 1
    normalized = [
        normalizer * v % P * pg % P for pg, v in zip(pow_gamma, vdiff_evals)
    ]
    return normalized, normalizer
