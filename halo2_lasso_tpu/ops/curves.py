"""Curve catalog: BN254, Grumpkin, Pasta (Pallas/Vesta) parameters.

Mirrors the curve surface of the reference (halo2_curves bn256 / grumpkin /
pasta, with the `TwoChainCurve` pairing of 2-cycles — util/arithmetic.rs:
37-59). BN254 G1 has full device support (ops/ec.py); the other curves'
field specs and constants are catalogued here so the generic packed-limb
field ops work over them; device group ops for them follow the same recipe
as ops/ec.py (a=0 short Weierstrass for grumpkin; a=0 for pasta too).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from halo2_lasso_tpu.ops.bn254 import FQ_MODULUS, FR_MODULUS, Fq, Fr
from halo2_lasso_tpu.ops.field import FieldSpec


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    base: FieldSpec  # coordinates field
    scalar: FieldSpec  # group order field
    b: int  # y^2 = x^3 + b (a = 0 for all curves here)
    generator: Tuple[int, int]


# --- BN254 / Grumpkin 2-cycle ---
# grumpkin: defined over BN254's SCALAR field with group order = BN254's
# BASE field; y^2 = x^3 - 17, generator (1, sqrt(-16)).
GRUMPKIN_B = FR_MODULUS - 17
GRUMPKIN_GEN = (
    1,
    17631683881184975370165255887551781615748388533673675138860,  # sqrt(-16) mod r
)

BN254_G1 = CurveSpec("bn254_g1", base=Fq, scalar=Fr, b=3, generator=(1, 2))
GRUMPKIN = CurveSpec(
    "grumpkin", base=Fr, scalar=Fq, b=GRUMPKIN_B, generator=GRUMPKIN_GEN
)

# --- Pasta 2-cycle ---
PALLAS_MODULUS = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
VESTA_MODULUS = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

Fp_pallas = FieldSpec(name="pallas_base", modulus=PALLAS_MODULUS)
Fq_vesta = FieldSpec(name="vesta_base", modulus=VESTA_MODULUS)

PALLAS = CurveSpec(
    "pallas",
    base=Fp_pallas,
    scalar=Fq_vesta,
    b=5,
    generator=(PALLAS_MODULUS - 1, 2),
)
VESTA = CurveSpec(
    "vesta",
    base=Fq_vesta,
    scalar=Fp_pallas,
    b=5,
    generator=(VESTA_MODULUS - 1, 2),
)

# TwoChainCurve pairs (util/arithmetic.rs:37-59)
TWO_CHAIN = {
    "bn254_g1": GRUMPKIN,
    "grumpkin": BN254_G1,
    "pallas": VESTA,
    "vesta": PALLAS,
}


def on_curve(spec: CurveSpec, x: int, y: int) -> bool:
    p = spec.base.modulus
    return (y * y - x * x * x - spec.b) % p == 0


def sqrt_mod(a: int, p: int):
    """Square root mod odd prime p, or None if a is a non-residue.
    p ≡ 3 (mod 4) shortcut (BN254 Fq), Tonelli–Shanks otherwise (Fr, pasta)."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c = s, pow(z, q, p)
    t, r = pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        r = r * b % p
        t = t * c % p
    return r


def hash_to_curve(curve: CurveSpec, seed: bytes, n: int):
    """n independent generators with publicly UNKNOWN discrete logs, by
    try-and-increment: x candidates from keccak(seed ‖ i ‖ ctr), y the
    canonical root of x³ + b (all catalogued curves have cofactor 1).
    Matches the intent of the reference's hash_to_curve setup
    (pcs/multilinear/ipa.rs:105,123) — unlike an s_i·G derivation, no party
    can compute any dlog relation between the outputs. Returns an (n, 2)
    object array of affine coordinates."""
    import numpy as np

    from halo2_lasso_tpu.ops.keccak import keccak256

    p = curve.base.modulus
    out = np.empty((n, 2), dtype=object)
    for i in range(n):
        ctr = 0
        while True:
            h = keccak256(seed + i.to_bytes(8, "little") + ctr.to_bytes(4, "little"))
            x = int.from_bytes(h, "little") % p
            y = sqrt_mod((x * x % p * x + curve.b) % p, p)
            if y is not None and x != 0:
                out[i, 0] = x
                out[i, 1] = min(y, p - y)  # canonical sign
                break
            ctr += 1
    return out


# ---------------------------------------------------------------------------
# host-side affine arithmetic over any catalogued a=0 curve (python ints;
# None or (0, 0) = identity). Used by verifiers for the handful of
# commitment-point combinations per proof — device MSMs handle the bulk.
# ---------------------------------------------------------------------------


def host_add(curve: CurveSpec, p, q):
    m = curve.base.modulus
    if p is None or p == (0, 0):
        return q
    if q is None or q == (0, 0):
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % m == 0:
            return (0, 0)
        lam = 3 * x1 * x1 * pow(2 * y1, -1, m) % m
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, m) % m
    x3 = (lam * lam - x1 - x2) % m
    y3 = (lam * (x1 - x3) - y1) % m
    return (x3, y3)


def host_mul(curve: CurveSpec, p, k: int):
    k = k % curve.scalar.modulus
    acc = (0, 0)
    add = p
    while k:
        if k & 1:
            acc = host_add(curve, acc, add)
        add = host_add(curve, add, add)
        k >>= 1
    return acc
