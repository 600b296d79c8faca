"""Polynomial commitment schemes.

Protocol shape mirrors the reference trait (pcs.rs:22-130): setup / trim /
commit / batch_commit / open / batch_open / read_commitments / verify /
batch_verify, with `Evaluation{poly, point, value}` and additive-commitment
batch opening via a degree-2 sumcheck (pcs/multilinear.rs:109-276).

Commitments cross the host boundary as affine (x, y) canonical int pairs
((0, 0) = identity); the heavy MSMs run on device.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import pairing as hostec
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.piop import sum_check
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript


@dataclasses.dataclass(frozen=True)
class Evaluation:
    """(poly index, point index, claimed value) — pcs.rs:133-155."""

    poly: int
    point: int
    value: int


class PointCommitmentIO:
    """Default transcript IO for PCS whose commitments are single affine
    points (KZG/Gemini/Zeromorph/IPA). Mirrors the reference's
    Pcs::read_commitments over CurveAffine chunks (pcs.rs:93-101)."""

    @staticmethod
    def write_commitments(comms, transcript) -> None:
        transcript.write_commitments(comms)

    @staticmethod
    def read_commitments(vp, n: int, transcript):
        return transcript.read_commitments(n)

    @staticmethod
    def verifier_commitment(comm):
        """Map a prover-side commitment to its verifier-side form (identity
        for point commitments; Brakedown keeps only the Merkle root)."""
        return comm


def g1_sum_with_scalar(
    scalars: Sequence[int], bases: Sequence[Tuple[int, int]]
) -> Tuple[int, int]:
    """Host small MSM over commitment points (AdditiveCommitment::sum_with_scalar,
    pcs.rs:157-177). Fine on host: a handful of points per proof."""
    acc = None
    for s, b in zip(scalars, bases):
        if s % Fr.modulus == 0 or (b[0] == 0 and b[1] == 0):
            continue
        acc = hostec._add(acc, hostec._mul(b, s % Fr.modulus))
    return (0, 0) if acc is None else acc


# ---------------------------------------------------------------------------
# additive batch open/verify (BDFG-style over sumcheck)
# ---------------------------------------------------------------------------


def additive_batch_open(
    pcs,
    pp,
    num_vars: int,
    polys: Sequence[jnp.ndarray],
    points: Sequence[Sequence[int]],
    evals: Sequence[Evaluation],
    transcript: Keccak256Transcript,
) -> None:
    """pcs/multilinear.rs:134-235 semantics. `polys` are device eval arrays.
    The poly field comes from the PCS class (`FIELD` attr, default Fr) so
    scalar-field-swapped curves (grumpkin) reuse this path."""
    from halo2_lasso_tpu.ops import field as F

    spec = getattr(pcs, "FIELD", Fr)
    p = spec.modulus
    ell = max((len(evals) - 1).bit_length(), 0) if len(evals) > 1 else 0
    t = transcript.squeeze_challenges(ell)

    eq_xt = [1]
    if ell:
        td = jnp.asarray(spec.encode(t))
        eq_xt = [int(v) for v in spec.decode(np.asarray(mle.eq_xy(spec, td)))]

    # merge polys per point (scalar bookkeeping mirrors the reference fold)
    merged: List = [None] * len(points)  # (scalar, device array) | None
    for ev, eq_i in zip(evals, eq_xt):
        j = ev.point
        if merged[j] is None:
            merged[j] = (eq_i, polys[ev.poly])
        else:
            coeff, arr = merged[j]
            if coeff != 1:
                arr = F.mont_mul(spec, arr, jnp.asarray(spec.encode([coeff]))[0][None, :])
                coeff = 1
            contrib = F.mont_mul(
                spec, polys[ev.poly], jnp.asarray(spec.encode([eq_i]))[0][None, :]
            )
            merged[j] = (1, F.add(spec, arr, contrib))

    terms = []
    for j, m in enumerate(merged):
        if m is None:
            continue
        scalar, arr = m
        yd = jnp.asarray(spec.encode(list(points[j])))
        terms.append((scalar, mle.eq_xy(spec, yd), arr, j))

    tilde_gs_sum = sum(ev.value * eq_i for ev, eq_i in zip(evals, eq_xt)) % p

    from halo2_lasso_tpu.utils.timer import timed

    with timed.scope("batch_open_sumcheck"):
        challenges, _ = sum_check.prove_coeff_products(
            spec, num_vars, [(s, e, a) for s, e, a, _ in terms], tilde_gs_sum, transcript
        )

    # g' = sum_j (scalar_j * eq_xy_eval(challenges, point_j)) * merged_j
    g_prime = None
    for scalar, _, arr, j in terms:
        coef = scalar * mle.eq_xy_eval_host(p, challenges, list(points[j])) % p
        contrib = F.mont_mul(spec, arr, jnp.asarray(spec.encode([coef]))[0][None, :])
        g_prime = contrib if g_prime is None else F.add(spec, g_prime, contrib)

    with timed.scope("batch_open_pcs_open"):
        pcs.open(pp, g_prime, challenges, None, transcript)


def additive_batch_verify(
    pcs,
    vp,
    num_vars: int,
    comms: Sequence[Tuple[int, int]],
    points: Sequence[Sequence[int]],
    evals: Sequence[Evaluation],
    transcript: Keccak256Transcript,
) -> None:
    """pcs/multilinear.rs:237-275 semantics."""
    spec = getattr(pcs, "FIELD", Fr)
    p = spec.modulus
    ell = max((len(evals) - 1).bit_length(), 0) if len(evals) > 1 else 0
    t = transcript.squeeze_challenges(ell)
    eq_xt = [1]
    if ell:
        td = jnp.asarray(spec.encode(t))
        eq_xt = [int(v) for v in spec.decode(np.asarray(mle.eq_xy(spec, td)))]

    tilde_gs_sum = sum(ev.value * eq_i for ev, eq_i in zip(evals, eq_xt)) % p
    g_prime_eval, challenges = sum_check.verify_coeff(p, num_vars, 2, tilde_gs_sum, transcript)

    eq_xy_evals = [mle.eq_xy_eval_host(p, challenges, list(pt)) for pt in points]
    scalars = [eq_xy_evals[ev.point] * eq_i % p for ev, eq_i in zip(evals, eq_xt)]
    bases = [comms[ev.poly] for ev in evals]
    combine = getattr(pcs, "sum_commitments", None)
    g_prime_comm = combine(scalars, bases) if combine else g1_sum_with_scalar(scalars, bases)
    pcs.verify(vp, g_prime_comm, challenges, g_prime_eval, transcript)
