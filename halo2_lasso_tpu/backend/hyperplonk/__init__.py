"""HyperPlonk backend: setup / preprocess / prove / verify, generic over the
polynomial commitment scheme.

Orchestration mirrors /root/reference/plonkish_backend/src/backend/
hyperplonk.rs:85-369 (`HyperPlonk<Pcs>` is generic over the PCS, :36);
compute runs on device (witness tables, sumcheck, MSMs), Fiat-Shamir and
pairings on host. Instantiate for another PCS with `hyperplonk(PcsClass)`
(the reference's `HyperPlonk<MultilinearIpa<...>>` etc., hyperplonk.rs:
398-427).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.backend import PlonkishCircuit, PlonkishCircuitInfo
from halo2_lasso_tpu.backend.hyperplonk import preprocessor, prover, verifier
from halo2_lasso_tpu.expression import Expression
from halo2_lasso_tpu.ops import field as F
from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, Fr
from halo2_lasso_tpu.pcs import Evaluation
from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
from halo2_lasso_tpu.poly import multilinear as mle
from halo2_lasso_tpu.transcript import Keccak256Transcript
from halo2_lasso_tpu.utils.timer import timed


def _max_num_vars(circuit_info_or_pp) -> int:
    """Largest num_vars the PCS must support: the circuit hypercube or the
    largest Lasso subtable, whichever is bigger."""
    nv = circuit_info_or_pp.k if hasattr(circuit_info_or_pp, "k") else circuit_info_or_pp.num_vars
    for ll in circuit_info_or_pp.lasso_lookups:
        for mem in ll.table.memories:
            nv = max(nv, mem.subtable.index_bits)
    return nv


def new_transcript(proof: Optional[bytes] = None) -> Keccak256Transcript:
    return Keccak256Transcript(Fr.modulus, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def transcript_for(pcs_cls, proof: Optional[bytes] = None) -> Keccak256Transcript:
    """Transcript configured for a PCS's curve/field (grumpkin-backed PCS
    squeeze challenges over Fq and validate points over Fr with b=-17)."""
    from halo2_lasso_tpu.ops import curves

    curve = getattr(pcs_cls, "CURVE", curves.BN254_G1)
    field = getattr(pcs_cls, "FIELD", Fr)
    return Keccak256Transcript(
        field.modulus,
        base_modulus=curve.base.modulus,
        proof=proof,
        curve_b=curve.b,
    )


@dataclasses.dataclass
class HyperPlonkProverParam:
    pcs: Any
    num_instances: List[int]
    num_witness_polys: List[int]
    num_challenges: List[int]
    lookups: list
    num_permutation_z_polys: int
    num_vars: int
    expression: Expression
    preprocess_polys: List[jnp.ndarray]
    preprocess_comms: List[Any]
    permutation_polys: List[Tuple[int, jnp.ndarray]]
    permutation_comms: List[Any]
    lasso_lookups: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class HyperPlonkVerifierParam:
    pcs: Any
    num_instances: List[int]
    num_witness_polys: List[int]
    num_challenges: List[int]
    num_lookups: int
    num_permutation_z_polys: int
    num_vars: int
    expression: Expression
    preprocess_comms: List[Any]
    permutation_comms: List[Tuple[int, Any]]
    lasso_lookups: list = dataclasses.field(default_factory=list)


class HyperPlonk:
    Pcs = MultilinearKzg

    @classmethod
    def field(cls):
        """The SNARK field = the PCS's polynomial field (Fr for BN254-based
        PCS, Fq for grumpkin-based IPA/Hyrax)."""
        return getattr(cls.Pcs, "FIELD", Fr)

    @classmethod
    def transcript(cls, proof: Optional[bytes] = None) -> Keccak256Transcript:
        return transcript_for(cls.Pcs, proof)

    @classmethod
    def setup(cls, circuit_info: PlonkishCircuitInfo, rng: np.random.RandomState):
        assert circuit_info.is_well_formed()
        return cls.Pcs.setup(1 << _max_num_vars(circuit_info), rng=rng)

    @classmethod
    @timed("preprocess")
    def preprocess(
        cls, param, circuit_info: PlonkishCircuitInfo
    ) -> Tuple[HyperPlonkProverParam, HyperPlonkVerifierParam]:
        assert circuit_info.is_well_formed()
        num_vars = circuit_info.k
        # PCS params must also cover Lasso final_cts polys, whose subtables
        # may be larger than the circuit's hypercube
        pcs_pp, pcs_vp = cls.Pcs.trim(param, 1 << _max_num_vars(circuit_info))

        from halo2_lasso_tpu.ops import field as F

        spec = cls.field()
        preprocess_polys = [
            F.encode_dev(spec, vals) for vals in circuit_info.preprocess_polys
        ]
        preprocess_comms = cls.Pcs.batch_commit(pcs_pp, preprocess_polys)

        perm_poly_indices = circuit_info.permutation_polys()
        perm_values = preprocessor.permutation_polys_values(
            num_vars, perm_poly_indices, circuit_info.permutations
        )
        permutation_polys = [F.encode_dev(spec, v) for v in perm_values]
        permutation_comms = cls.Pcs.batch_commit(pcs_pp, permutation_polys)

        num_permutation_z_polys, expression = preprocessor.compose(circuit_info)

        pp = HyperPlonkProverParam(
            pcs=pcs_pp,
            num_instances=list(circuit_info.num_instances),
            num_witness_polys=list(circuit_info.num_witness_polys),
            num_challenges=list(circuit_info.num_challenges),
            lookups=list(circuit_info.lookups),
            num_permutation_z_polys=num_permutation_z_polys,
            num_vars=num_vars,
            expression=expression,
            preprocess_polys=preprocess_polys,
            preprocess_comms=preprocess_comms,
            permutation_polys=list(zip(perm_poly_indices, permutation_polys)),
            permutation_comms=permutation_comms,
            lasso_lookups=list(circuit_info.lasso_lookups),
        )
        vc = cls.Pcs.verifier_commitment
        vp = HyperPlonkVerifierParam(
            pcs=pcs_vp,
            num_instances=list(circuit_info.num_instances),
            num_witness_polys=list(circuit_info.num_witness_polys),
            num_challenges=list(circuit_info.num_challenges),
            num_lookups=len(circuit_info.lookups),
            num_permutation_z_polys=num_permutation_z_polys,
            num_vars=num_vars,
            expression=expression,
            preprocess_comms=[vc(c) for c in preprocess_comms],
            permutation_comms=list(
                zip(perm_poly_indices, [vc(c) for c in permutation_comms])
            ),
            lasso_lookups=list(circuit_info.lasso_lookups),
        )
        return pp, vp

    @classmethod
    @timed("prove")
    def prove(
        cls,
        pp: HyperPlonkProverParam,
        circuit: PlonkishCircuit,
        transcript: Keccak256Transcript,
    ) -> None:
        spec = cls.field()
        p = spec.modulus
        num_vars = pp.num_vars

        instances = circuit.instances()
        for num, inst in zip(pp.num_instances, instances):
            assert len(inst) == num
            for v in inst:
                transcript.common_field_element(v)
        from halo2_lasso_tpu.ops import field as F

        instance_polys = [
            F.encode_dev(spec, prover.instance_poly_values(num_vars, inst, spec))
            for inst in instances
        ]

        # Round 0..n: witness phases
        witness_polys: List[jnp.ndarray] = []
        witness_comms: List[Any] = []
        challenges: List[int] = []
        for round_, (num_w, num_c) in enumerate(
            zip(pp.num_witness_polys, pp.num_challenges)
        ):
            with timed.scope(f"witness_collector-{round_}"):
                cols = circuit.synthesize(round_, challenges)
                assert len(cols) == num_w
                polys_r = [F.encode_dev(spec, c) for c in cols]
            comms = cls.Pcs.batch_commit(pp.pcs, polys_r)
            cls.Pcs.write_commitments(comms, transcript)
            witness_comms.extend(comms)
            witness_polys.extend(polys_r)
            challenges.extend(transcript.squeeze_challenges(num_c))

        # Lasso lookups: commit the Surge witness columns (dims, subtable
        # reads E, read timestamps) + table-sized final counters; the
        # pointwise bindings are already inside pp.expression (compose)
        lasso_locals: List[List[jnp.ndarray]] = []
        lasso_fcs: List[List[jnp.ndarray]] = []
        lasso_flat: List[jnp.ndarray] = []
        lasso_comms: List[Any] = []
        lasso_layouts = []
        if pp.lasso_lookups:
            from halo2_lasso_tpu.lasso import integration as lasso_int

            lasso_layouts = [lasso_int.LassoLayout(lk) for lk in pp.lasso_lookups]
            base_polys = instance_polys + pp.preprocess_polys + witness_polys
            with timed.scope("lasso_witness"):
                for lk, layout in zip(pp.lasso_lookups, lasso_layouts):
                    loc, fcs = lasso_int.build_lookup_witness(
                        spec, lk, layout, base_polys, challenges, num_vars
                    )
                    lasso_locals.append(loc)
                    lasso_fcs.append(fcs)
            lasso_flat = [a for loc in lasso_locals for a in loc]
            with timed.scope("lasso_commit"):
                lasso_comms = cls.Pcs.batch_commit(pp.pcs, lasso_flat)
                fc_flat = [a for fcs in lasso_fcs for a in fcs]
                fc_comms = cls.Pcs.batch_commit(pp.pcs, fc_flat)
            cls.Pcs.write_commitments(lasso_comms, transcript)
            cls.Pcs.write_commitments(fc_comms, transcript)

        polys = instance_polys + pp.preprocess_polys + witness_polys + lasso_flat

        # Round n: beta, lookup m polys
        beta = transcript.squeeze_challenge()
        with timed.scope("lookup_compressed_polys"):
            max_width = max((len(l) for l in pp.lookups), default=0)
            betas = [pow(beta, i, p) for i in range(max_width)]
            compressed = prover.lookup_compressed_polys(
                pp.lookups, polys, challenges, betas, spec=spec
            )
        with timed.scope("lookup_m_polys"):
            m_polys = prover.lookup_m_polys(compressed, spec=spec)
        m_comms = cls.Pcs.batch_commit(pp.pcs, m_polys)
        cls.Pcs.write_commitments(m_comms, transcript)

        # Round n+1: gamma, h polys + permutation z polys
        gamma = transcript.squeeze_challenge()
        with timed.scope("lookup_h_polys"):
            h_polys = prover.lookup_h_polys(compressed, m_polys, gamma, spec=spec)
        with timed.scope("permutation_z_polys"):
            z_polys = prover.permutation_z_polys(
                pp.num_permutation_z_polys,
                pp.permutation_polys,
                polys,
                beta,
                gamma,
                spec=spec,
            )
        hz_polys = h_polys + z_polys
        hz_comms = cls.Pcs.batch_commit(pp.pcs, hz_polys)
        cls.Pcs.write_commitments(hz_comms, transcript)

        # Round n+2: zero check
        alpha = transcript.squeeze_challenge()
        y = transcript.squeeze_challenges(num_vars)

        all_polys = (
            polys
            + [poly for _, poly in pp.permutation_polys]
            + m_polys
            + hz_polys
        )
        all_comms = (
            [None] * len(pp.num_instances)  # instance polys are never opened
            + list(pp.preprocess_comms)
            + witness_comms
            + lasso_comms
            + list(pp.permutation_comms)
            + m_comms
            + hz_comms
        )
        challenges = challenges + [beta, gamma, alpha]
        with timed.scope("zero_check"):
            points, evals = prover.prove_zero_check(
                len(pp.num_instances),
                pp.expression,
                all_polys,
                challenges,
                y,
                transcript,
                spec=spec,
            )

        # Lasso offline memory check: batched GKR grand products over the
        # read/write/init/final fingerprint multisets; open the m-sized
        # leaves at x_m through the main batch opening below
        if pp.lasso_lookups:
            gamma_l = transcript.squeeze_challenge()
            tau = transcript.squeeze_challenge()
            with timed.scope("lasso_memory_check"):
                x_m, x_ns = lasso_int.prove_memory_check(
                    spec,
                    lasso_layouts,
                    lasso_locals,
                    lasso_fcs,
                    gamma_l,
                    tau,
                    num_vars,
                    transcript,
                )
            lasso_offset = len(polys) - len(lasso_flat)
            # one stacked fold chain + one device->host pull for all
            # openings (per-poly pulls cost one tunnel round-trip each)
            xm_vals = mle.evaluate_stacked_ints(spec, lasso_flat, x_m)
            transcript.write_field_elements(xm_vals)
            pt_idx = len(points)
            points = list(points) + [list(x_m)]
            evals = list(evals) + [
                Evaluation(lasso_offset + i, pt_idx, v)
                for i, v in enumerate(xm_vals)
            ]

        # PCS batch open
        with timed.scope("pcs_batch_open"):
            cls.Pcs.batch_open(pp.pcs, all_polys, all_comms, points, evals, transcript)

        # Lasso final counters: open per subtable size at that group's x_n
        if pp.lasso_lookups:
            groups = lasso_int._n_groups(lasso_layouts)
            with timed.scope("lasso_open_fc"):
                for nv_n, members in groups.items():
                    xn = x_ns[nv_n]
                    group_polys = [lasso_fcs[li][mi] for li, mi in members]
                    vals = mle.evaluate_stacked_ints(spec, group_polys, xn)
                    transcript.write_field_elements(vals)
                    n_evals = [
                        Evaluation(j, 0, v) for j, v in enumerate(vals)
                    ]
                    cls.Pcs.batch_open(
                        pp.pcs, group_polys, None, [xn], n_evals, transcript
                    )

    @classmethod
    @timed("verify")
    def verify(
        cls,
        vp: HyperPlonkVerifierParam,
        instances: Sequence[Sequence[int]],
        transcript: Keccak256Transcript,
    ) -> None:
        num_vars = vp.num_vars
        for num, inst in zip(vp.num_instances, instances):
            assert len(inst) == num
            for v in inst:
                transcript.common_field_element(v)

        witness_comms: List[Any] = []
        challenges: List[int] = []
        for num_w, num_c in zip(vp.num_witness_polys, vp.num_challenges):
            witness_comms.extend(cls.Pcs.read_commitments(vp.pcs, num_w, transcript))
            challenges.extend(transcript.squeeze_challenges(num_c))

        lasso_comms: List[Any] = []
        fc_comms: List[Any] = []
        lasso_layouts = []
        if vp.lasso_lookups:
            from halo2_lasso_tpu.lasso import integration as lasso_int

            lasso_layouts = [lasso_int.LassoLayout(lk) for lk in vp.lasso_lookups]
            total_locals = sum(l.num_local for l in lasso_layouts)
            total_mems = sum(len(l.mems) for l in lasso_layouts)
            lasso_comms = cls.Pcs.read_commitments(vp.pcs, total_locals, transcript)
            fc_comms = cls.Pcs.read_commitments(vp.pcs, total_mems, transcript)

        beta = transcript.squeeze_challenge()
        m_comms = cls.Pcs.read_commitments(vp.pcs, vp.num_lookups, transcript)
        gamma = transcript.squeeze_challenge()
        hz_comms = cls.Pcs.read_commitments(
            vp.pcs, vp.num_lookups + vp.num_permutation_z_polys, transcript
        )
        alpha = transcript.squeeze_challenge()
        y = transcript.squeeze_challenges(num_vars)

        challenges = challenges + [beta, gamma, alpha]
        points, evals = verifier.verify_zero_check(
            num_vars,
            vp.expression,
            instances,
            challenges,
            y,
            transcript,
            spec=cls.field(),
        )

        # Lasso memory check (mirrors prove): GKR grand products, then the
        # fingerprint recombination checks against the x_m / x_n openings
        if vp.lasso_lookups:
            gamma_l = transcript.squeeze_challenge()
            tau = transcript.squeeze_challenge()
            x_m, q_m, n_claims = lasso_int.verify_memory_check(
                cls.field(), lasso_layouts, gamma_l, tau, num_vars, transcript
            )
            total_locals = sum(l.num_local for l in lasso_layouts)
            xm_vals = transcript.read_field_elements(total_locals)
            local_evals_by_lookup = []
            off = 0
            for layout in lasso_layouts:
                local_evals_by_lookup.append(xm_vals[off : off + layout.num_local])
                off += layout.num_local
            lasso_int.check_m_fingerprints(
                cls.field(), lasso_layouts, local_evals_by_lookup, q_m, gamma_l, tau
            )
            num_poly_before_lasso = (
                len(vp.num_instances)
                + len(vp.preprocess_comms)
                + len(witness_comms)
            )
            pt_idx = len(points)
            points = list(points) + [list(x_m)]
            evals = list(evals) + [
                Evaluation(num_poly_before_lasso + i, pt_idx, v)
                for i, v in enumerate(xm_vals)
            ]

        comms = (
            [None] * len(vp.num_instances)  # never opened (pcs_query excludes)
            + list(vp.preprocess_comms)
            + witness_comms
            + lasso_comms
            + [c for _, c in vp.permutation_comms]
            + m_comms
            + hz_comms
        )
        cls.Pcs.batch_verify(vp.pcs, comms, points, evals, transcript)

        if vp.lasso_lookups:
            spec = cls.field()
            groups = lasso_int._n_groups(lasso_layouts)
            fc_pos = {}
            pos = 0
            for li, layout in enumerate(lasso_layouts):
                for mi in range(len(layout.mems)):
                    fc_pos[(li, mi)] = pos
                    pos += 1
            for nv_n, members in groups.items():
                x_n, init_claims, final_claims = n_claims[nv_n]
                fc_evals = transcript.read_field_elements(len(members))
                lasso_int.check_n_fingerprints(
                    spec,
                    lasso_layouts,
                    nv_n,
                    members,
                    x_n,
                    init_claims,
                    final_claims,
                    fc_evals,
                    gamma_l,
                    tau,
                )
                group_comms = [fc_comms[fc_pos[key]] for key in members]
                n_evals = [Evaluation(j, 0, v) for j, v in enumerate(fc_evals)]
                cls.Pcs.batch_verify(
                    vp.pcs, group_comms, [x_n], n_evals, transcript
                )


def hyperplonk(pcs_cls) -> type:
    """HyperPlonk instantiated over `pcs_cls` (reference: HyperPlonk<Pcs>)."""
    if pcs_cls is MultilinearKzg:
        return HyperPlonk
    return type(f"HyperPlonk_{pcs_cls.__name__}", (HyperPlonk,), {"Pcs": pcs_cls})
