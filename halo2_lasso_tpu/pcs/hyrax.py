"""Multilinear Hyrax: matrix commitment over an IPA base.

Semantics mirror /root/reference/plonkish_backend/src/pcs/multilinear/
hyrax.rs: the 2^k evals are viewed as a (num_chunks x row_len) matrix; the
commitment is one MSM per row; open folds the HIGH variables (fix_last_vars)
and IPA-opens the folded row-space poly at the LOW sub-point; the verifier
recombines the row commitments with eq(hi) before IPA-verifying.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.ops import curves, ec
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import Fq, Fr
from halo2_lasso_tpu.pcs import (
    Evaluation,
    additive_batch_open,
    additive_batch_verify,
    g1_sum_with_scalar,
)
from halo2_lasso_tpu.pcs.ipa import IpaParams, MultilinearIpa, MultilinearIpaGrumpkin
from halo2_lasso_tpu.pcs.multilinear_kzg import PcsError
from halo2_lasso_tpu.poly import multilinear as mle

P = Fr.modulus


@dataclasses.dataclass
class HyraxParams:
    num_vars: int
    batch_num_vars: int
    row_num_vars: int
    ipa: IpaParams

    @property
    def row_len(self):
        return 1 << self.row_num_vars

    @property
    def num_chunks(self):
        return 1 << max(self.num_vars - self.row_num_vars, 0)


class MultilinearHyrax:
    """Generic over the curve via the IPA base: subclass and set IPA (and
    the matching CURVE/FIELD) for grumpkin, mirroring the reference's
    MultilinearHyrax<grumpkin::G1Affine> (hyperplonk.rs:423)."""

    IPA = MultilinearIpa
    CURVE = curves.BN254_G1
    FIELD = Fr

    @classmethod
    def setup(cls, poly_size: int, batch_size: int = 1, rng=None) -> HyraxParams:
        num_vars = poly_size.bit_length() - 1
        batch_num_vars = (poly_size * batch_size - 1).bit_length() if batch_size > 1 else num_vars
        row_num_vars = -(-batch_num_vars // 2)
        ipa = cls.IPA.setup(1 << row_num_vars)
        return HyraxParams(
            num_vars=num_vars,
            batch_num_vars=batch_num_vars,
            row_num_vars=row_num_vars,
            ipa=ipa,
        )

    @classmethod
    def trim(cls, param: HyraxParams, poly_size: int, batch_size: int = 1):
        num_vars = poly_size.bit_length() - 1
        batch_num_vars = (poly_size * batch_size - 1).bit_length() if batch_size > 1 else num_vars
        row_num_vars = -(-batch_num_vars // 2)
        if param.row_num_vars < row_num_vars:
            raise PcsError("too many variates to trim")
        ipa, _ = cls.IPA.trim(param.ipa, 1 << row_num_vars)
        p = HyraxParams(
            num_vars=num_vars,
            batch_num_vars=batch_num_vars,
            row_num_vars=row_num_vars,
            ipa=ipa,
        )
        return p, p

    @classmethod
    def commit(cls, pp: HyraxParams, evals: jnp.ndarray) -> List[Tuple[int, int]]:
        n = evals.shape[0]
        row_len = min(pp.row_len, n)
        num_rows = n // row_len
        g = {k: v[:row_len] for k, v in pp.ipa.g.items()}
        comms = []
        for r in range(num_rows):
            comms.append(
                ec.msm_to_affine_int(
                    g,
                    evals[r * row_len : (r + 1) * row_len],
                    cls.CURVE.base,
                    cls.FIELD,
                )
            )
        return comms

    @classmethod
    def batch_commit(cls, pp, polys) -> List[List[Tuple[int, int]]]:
        return [cls.commit(pp, p) for p in polys]

    @staticmethod
    def write_commitments(comms: Sequence[List[Tuple[int, int]]], transcript) -> None:
        for comm in comms:
            transcript.write_commitments(comm)

    @staticmethod
    def read_commitments(vp: HyraxParams, n: int, transcript) -> List[List[Tuple[int, int]]]:
        return [transcript.read_commitments(vp.num_chunks) for _ in range(n)]

    @staticmethod
    def verifier_commitment(comm):
        return comm

    @classmethod
    def sum_commitments(cls, scalars: Sequence[int], comms: Sequence[List[Tuple[int, int]]]):
        """Chunk-wise additive combination (vector commitment)."""
        num_chunks = len(comms[0])
        return [
            cls.IPA.sum_commitments(scalars, [c[i] for c in comms])
            for i in range(num_chunks)
        ]

    @classmethod
    def open(cls, pp: HyraxParams, evals: jnp.ndarray, point: Sequence[int], eval_, transcript) -> None:
        S = cls.FIELD
        row_nv = min(pp.row_num_vars, len(point))
        lo, hi = list(point[:row_nv]), list(point[row_nv:])
        folded = evals
        if hi:
            xd = jnp.asarray(S.encode(hi))
            for i in range(len(hi) - 1, -1, -1):
                folded = mle.fix_last_var(S, folded, xd[i])
        cls.IPA.open(pp.ipa, folded, lo, eval_, transcript)

    @classmethod
    def verify(cls, vp: HyraxParams, comm: List[Tuple[int, int]], point: Sequence[int], eval_: int, transcript) -> None:
        S = cls.FIELD
        row_nv = min(vp.row_num_vars, len(point))
        lo, hi = list(point[:row_nv]), list(point[row_nv:])
        if hi:
            eq_hi = mle.eq_xy(S, jnp.asarray(S.encode(hi)))
            scalars = [int(v) for v in S.decode(np.asarray(eq_hi))]
            folded_comm = cls.IPA.sum_commitments(scalars, comm)
        else:
            assert len(comm) == 1
            folded_comm = comm[0]
        cls.IPA.verify(vp.ipa, folded_comm, lo, eval_, transcript)

    @classmethod
    def batch_open(cls, pp, polys, comms, points, evals, transcript):
        additive_batch_open(cls, pp, pp.num_vars, polys, points, evals, transcript)

    @classmethod
    def batch_verify(cls, vp, comms, points, evals, transcript):
        additive_batch_verify(cls, vp, vp.num_vars, comms, points, evals, transcript)


class MultilinearHyraxGrumpkin(MultilinearHyrax):
    """Hyrax over grumpkin (hyperplonk.rs:423 parity): polys over bn254 Fq."""

    IPA = MultilinearIpaGrumpkin
    CURVE = curves.GRUMPKIN
    FIELD = Fq
