"""Reference-derived transcript wire-format KATs.

The expected constants below are HAND-DERIVED from the reference's
conventions (/root/reference/plonkish_backend/src/util/transcript.rs:126-166
+ util/hash.rs:19-21), independently of halo2_lasso_tpu.transcript:

  * the hash state absorbs each field element / point coordinate as its
    32-byte LITTLE-endian repr (`update_field_element` -> `to_repr()`);
  * squeeze: h = keccak256(state); the fresh state then absorbs h;
    challenge = int_le(h) mod r (`fe_mod_from_le_bytes`);
  * the proof stream stores field elements and affine coordinates
    BIG-endian (`repr.as_mut().reverse()`, transcript.rs:146-166);
  * a commitment absorbs x then y (transcript.rs:176-186).

The keccak permutation itself is pinned by published third-party vectors in
tests/test_keccak_kat.py — the first constant here (keccak256 of the empty
state) is the well-known c5d24601... digest, so this chain does not rest on
a self-snapshot anywhere.
"""

from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, Fr
from halo2_lasso_tpu.transcript import Keccak256Transcript

FR = Fr.modulus


def new_t(proof=None):
    return Keccak256Transcript(FR, base_modulus=FQ_MODULUS, proof=proof, curve_b=3)


def test_challenge_from_empty_state():
    # keccak256("") = c5d24601... (published constant); challenge =
    # int_le(h) % r
    t = new_t()
    assert t.squeeze_challenge() == int(
        "0fdbe8774275ba27ca86f75d50b3502b6f9bf74bbf0a9d6fb4600c5e2146d2c3", 16
    )


def test_challenge_after_field_element():
    # absorb fe=1 as 32-byte LE, then squeeze
    t = new_t()
    t.common_field_element(1)
    assert t.squeeze_challenge() == int(
        "14694f4d6d36953cfe4746996174bb77dfe3c3ea050244a11e93831a2e8c0745", 16
    )


def test_challenge_after_commitment_and_chaining():
    # absorb the bn254 generator (1, 2) as x-LE || y-LE; squeeze twice —
    # the second squeeze must see the state re-seeded with the first hash
    t = new_t()
    t.common_commitment((1, 2))
    assert t.squeeze_challenge() == int(
        "234a9e12e9b063b60f7e3289ee9b86a731de8e7e41bd4987f10982d6a753444d", 16
    )
    assert t.squeeze_challenge() == int(
        "2c86f0b47a8a7dffe2fd233873fe47a6d91af106174503a39632d0283d588f51", 16
    )


def test_stream_encodings_big_endian():
    # write_field_element stores the repr REVERSED (big-endian) on the
    # stream; write_commitment stores x then y the same way
    fe = int.from_bytes(bytes(range(1, 33)), "big") % FR
    t = new_t()
    t.write_field_element(fe)
    assert t.into_proof() == fe.to_bytes(32, "big")

    t = new_t()
    t.write_commitment((1, 2))
    assert t.into_proof() == (1).to_bytes(32, "big") + (2).to_bytes(32, "big")


def test_read_matches_write_and_absorbs():
    # reading a field element back must (a) return the value, (b) absorb it
    # into the state exactly as writing did — equal follow-up challenges
    fe = 123456789
    tw = new_t()
    tw.write_field_element(fe)
    cw = tw.squeeze_challenge()

    tr = new_t(proof=fe.to_bytes(32, "big"))
    assert tr.read_field_element() == fe
    assert tr.squeeze_challenge() == cw
