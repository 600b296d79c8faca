"""Gemini: multilinear PCS from univariate KZG via the fold-chain reduction.

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/
gemini.rs (section 2.4.2 of eprint 2022/420): commit the MLE's evals as
univariate coefficients; open by committing the fold chain f_1..f_{k-1}
(f_{i} = fix_var(f_{i-1}, x_{i-1}) — the same fused device fold as the
sumcheck), evaluating at beta and -beta^{2^i}, and batch-opening with the
fflonk univariate machinery; the verifier folds the negative-point evals
backwards to recover f_0(beta).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fr
from halo2_lasso_tpu.pcs import Evaluation, PointCommitmentIO, additive_batch_open, additive_batch_verify
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.pcs.univariate_kzg import UnivariateKzg
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.poly import univariate as uni

P = Fr.modulus


class Gemini(PointCommitmentIO):
    setup = staticmethod(UnivariateKzg.setup)
    trim = staticmethod(UnivariateKzg.trim)

    @staticmethod
    def commit(pp, evals: jnp.ndarray) -> Tuple[int, int]:
        return UnivariateKzg.commit(pp, evals)

    @staticmethod
    def batch_commit(pp, polys) -> List[Tuple[int, int]]:
        return [UnivariateKzg.commit(pp, p) for p in polys]

    @staticmethod
    def open(pp, evals: jnp.ndarray, point: Sequence[int], eval_, transcript) -> None:
        num_vars = len(point)
        xd = jnp.asarray(Fr.encode(list(point)))
        fs = [evals]
        for i in range(num_vars - 1):
            fs.append(mle.fix_var(Fr, fs[-1], xd[i]))
        comms = [UnivariateKzg.commit(pp, f) for f in fs[1:]]
        transcript.write_commitments(comms)

        beta = transcript.squeeze_challenge()
        points = [beta]
        sq = beta
        for _ in range(num_vars):
            points.append((-sq) % P)
            sq = sq * sq % P

        # evals: (poly 0 @ pt 0), (poly 0 @ pt 1), (poly i @ pt i+1)
        pairs = [(0, 0), (0, 1)] + [(i, i + 1) for i in range(1, num_vars)]
        evs = []
        for idx, pt in pairs:
            zd = jnp.asarray(Fr.encode([points[pt]]))[0]
            evs.append(
                Evaluation(idx, pt, F.decode_scalar(Fr, np.asarray(uni.evaluate(Fr, fs[idx], zd))))
            )
        transcript.write_field_elements([e.value for e in evs[1:]])
        UnivariateKzg.batch_open(pp, fs, points, evs, transcript)

    @staticmethod
    def verify(vp, comm, point: Sequence[int], eval_: int, transcript) -> None:
        num_vars = len(point)
        comms = [comm] + transcript.read_commitments(num_vars - 1)

        beta = transcript.squeeze_challenge()
        squares_of_beta = []
        sq = beta
        for _ in range(num_vars):
            squares_of_beta.append(sq)
            sq = sq * sq % P

        evals = transcript.read_field_elements(num_vars)

        # fold the negative-point evals backwards to f_0(beta)
        # (gemini.rs:184-190)
        eval_pos = eval_ % P
        for eval_neg, sob, x_i in reversed(list(zip(evals, squares_of_beta, point))):
            denom = ((1 - x_i) * sob + x_i) % P
            eval_pos = (
                (2 * sob * eval_pos - ((1 - x_i) * sob - x_i) * eval_neg)
                * pow(denom, -1, P)
            ) % P

        pairs = [(0, 0), (0, 1)] + [(i, i + 1) for i in range(1, num_vars)]
        evs = [
            Evaluation(idx, pt, v)
            for (idx, pt), v in zip(pairs, [eval_pos] + evals)
        ]
        points = [beta] + [(-s) % P for s in squares_of_beta]
        UnivariateKzg.batch_verify(vp, comms, points, evs, transcript)

    # ---- additive batch (BDFG over sumcheck) ----

    @staticmethod
    def batch_open(pp, polys, comms, points, evals, transcript):
        num_vars = len(points[0]) if points else 0
        additive_batch_open(Gemini, pp, num_vars, polys, points, evals, transcript)

    @staticmethod
    def batch_verify(vp, comms, points, evals, transcript):
        num_vars = len(points[0]) if points else 0
        additive_batch_verify(Gemini, vp, num_vars, comms, points, evals, transcript)
