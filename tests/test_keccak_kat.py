"""Keccak-256 known-answer tests.

Anchors the transcript hash to external truth (BASELINE.md acceptance:
bit-exactness with the reference's Keccak256 Fiat-Shamir,
util/transcript.rs:126-166). The reference uses ORIGINAL Keccak (pad 0x01),
the same function as Ethereum's keccak256 — so published Ethereum/Keccak
vectors are the ground truth. Also cross-checks the C backend against the
pure-python fallback, including both sides of the 136-byte rate boundary.
"""

import numpy as np
import pytest

from halo2_lasso_tpu.ops import keccak as K

# Published legacy-Keccak-256 digests (Keccak team test vectors, as used by
# Ethereum's keccak256):
KATS = [
    (b"", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    (b"abc", "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"),
    (
        b"The quick brown fox jumps over the lazy dog",
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15",
    ),
]


@pytest.mark.parametrize("msg,digest", KATS)
def test_published_vectors_python(msg, digest):
    assert K._PyKeccak256().update(msg).digest().hex() == digest


@pytest.mark.parametrize("msg,digest", KATS)
def test_published_vectors_default_backend(msg, digest):
    assert K.keccak256(msg).hex() == digest


def test_not_sha3():
    """Guard against silently swapping in NIST SHA3-256 (pad 0x06): its
    empty-input digest differs."""
    import hashlib

    assert K.keccak256(b"").hex() != hashlib.sha3_256(b"").hexdigest()


def test_c_and_python_backends_agree():
    if not K._load_native():
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    # every length around the 136-byte rate boundary + assorted sizes,
    # including multi-block and incremental (split) updates
    lengths = list(range(0, 10)) + list(range(130, 142)) + [271, 272, 273, 1000]
    for n in lengths:
        data = rng.bytes(n)
        py = K._PyKeccak256().update(data).digest()
        nat = K._NativeKeccak256()
        nat.update(data[: n // 3])
        nat.update(data[n // 3 :])
        assert nat.digest() == py, f"backend mismatch at length {n}"


def test_finalize_reset_matches_fresh():
    h = K.Keccak256()
    h.update(b"first message")
    d1 = h.finalize_reset()
    h.update(b"second")
    d2 = h.finalize_reset()
    assert d1 == K.keccak256(b"first message")
    assert d2 == K.keccak256(b"second")
