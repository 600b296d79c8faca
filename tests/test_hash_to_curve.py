"""Hash-to-curve generator derivation (IPA/Hyrax setup soundness).

Reference: pcs/multilinear/ipa.rs:105,123 uses
C::CurveExt::hash_to_curve("MultilinearIpa::setup") so that NO party knows
any discrete-log relation between the generators — that unknown-dlog
property is what makes Pedersen/IPA commitments binding. These tests pin
the try-and-increment construction (ops/curves.py:hash_to_curve).
"""

import numpy as np

from halo2_lasso_tpu.ops import curves
from halo2_lasso_tpu.ops.keccak import keccak256


def test_points_on_curve_and_distinct():
    for curve in (curves.BN254_G1, curves.GRUMPKIN, curves.PALLAS):
        pts = curves.hash_to_curve(curve, b"test-seed", 32)
        seen = set()
        for x, y in pts:
            assert curves.on_curve(curve, int(x), int(y))
            seen.add((int(x), int(y)))
        assert len(seen) == 32, "generators must be pairwise distinct"


def test_x_derived_from_hash_candidates():
    """Each x coordinate IS a keccak(seed ‖ i ‖ ctr) output reduced mod p for
    some small ctr — i.e. the construction leaves no room to sneak in a
    point with known dlog."""
    curve = curves.GRUMPKIN
    p = curve.base.modulus
    pts = curves.hash_to_curve(curve, b"bind-check", 8)
    for i, (x, y) in enumerate(pts):
        found = False
        for ctr in range(64):
            h = keccak256(b"bind-check" + i.to_bytes(8, "little") + ctr.to_bytes(4, "little"))
            if int.from_bytes(h, "little") % p == int(x):
                found = True
                break
        assert found, f"x[{i}] is not a hash candidate"
        # canonical sign: the smaller of the two roots
        assert int(y) <= p - int(y)


def test_sqrt_mod_both_branches():
    """p ≡ 3 (mod 4) shortcut (BN254 Fq) and full Tonelli–Shanks (Fr)."""
    from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, FR_MODULUS

    assert FQ_MODULUS % 4 == 3 and FR_MODULUS % 4 == 1
    rng = np.random.RandomState(7)
    for p in (FQ_MODULUS, FR_MODULUS):
        for _ in range(10):
            v = int.from_bytes(rng.bytes(40), "little") % p
            a = v * v % p
            r = curves.sqrt_mod(a, p)
            assert r is not None and r * r % p == a
        # non-residue must return None: v*z for a known non-residue z
        # (find one by scanning)
        z = 2
        while pow(z, (p - 1) // 2, p) == 1:
            z += 1
        assert curves.sqrt_mod(z, p) is None


def test_ipa_setup_uses_hash_to_curve():
    """The IPA setup's generators match hash_to_curve output exactly (no
    s_i·G scalar-multiple derivation anywhere)."""
    from halo2_lasso_tpu.ops import ec
    from halo2_lasso_tpu.pcs.ipa import MultilinearIpa

    pp = MultilinearIpa.setup(8)
    expected = curves.hash_to_curve(
        curves.BN254_G1, b"MultilinearIpa::setup", 9
    )
    got = ec.jacobian_to_affine(pp.g, curves.BN254_G1.base)
    assert [(int(x), int(y)) for x, y in got] == [
        (int(x), int(y)) for x, y in expected[:8]
    ]
