"""Transcript soundness: malformed proof streams must be cleanly rejected
(reference: checked CurveRead deserialization, util/transcript.rs:168-238)."""

import pytest

from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, FR_MODULUS
from halo2_lasso_tpu.transcript import Keccak256Transcript, TranscriptError


def wtx():
    return Keccak256Transcript(FR_MODULUS, base_modulus=FQ_MODULUS, curve_b=3)


def rtx(proof):
    return Keccak256Transcript(FR_MODULUS, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def test_roundtrip_on_curve_point():
    t = wtx()
    t.write_commitment((1, 2))  # BN254 G1 generator
    t.write_field_element(42)
    r = rtx(t.into_proof())
    assert r.read_commitment() == (1, 2)
    assert r.read_field_element() == 42
    # identical squeeze chains
    assert wtx().squeeze_challenge() == rtx(b"").squeeze_challenge()


def test_off_curve_point_rejected():
    # (1, 3) is not on y^2 = x^3 + 3
    t = Keccak256Transcript(FR_MODULUS, base_modulus=FQ_MODULUS)  # unchecked writer
    t.write_commitment((1, 3))
    with pytest.raises(TranscriptError, match="off-curve"):
        rtx(t.into_proof()).read_commitment()


def test_identity_commitment_roundtrip():
    """(0, 0) is the sound identity marker (no real point of y^2 = x^3 + b,
    b != 0, has x = y = 0): it must survive a write/read round trip — zero
    polys commit to the identity (e.g. Lasso read_ts with fresh addresses)."""
    t = wtx()
    t.write_commitment((0, 0))
    assert rtx(t.into_proof()).read_commitment() == (0, 0)


def test_oversized_coordinate_rejected():
    proof = FQ_MODULUS.to_bytes(32, "big") + (2).to_bytes(32, "big")
    with pytest.raises(TranscriptError, match="invalid point"):
        rtx(proof).read_commitment()


def test_oversized_field_element_rejected():
    proof = FR_MODULUS.to_bytes(32, "big")
    with pytest.raises(TranscriptError, match="invalid field element"):
        rtx(proof).read_field_element()


def test_truncated_proof_rejected():
    proof = (5).to_bytes(32, "big")[:16]
    with pytest.raises(TranscriptError, match="unexpected end"):
        rtx(proof).read_field_element()
    with pytest.raises(TranscriptError, match="unexpected end"):
        rtx((1).to_bytes(32, "big")).read_commitment()
