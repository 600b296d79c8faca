"""BN254 (a.k.a. BN256/alt_bn128) parameters.

Matches halo2_curves `bn256` used by the reference
(/root/reference/plonkish_backend/Cargo.toml:7): Fr scalar field, Fq base
field, G1: y^2 = x^3 + 3, G2 over Fq2 with b = 3/(9+u).
"""

from __future__ import annotations

from halo2_lasso_tpu.ops.field import FieldSpec

# field moduli
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583

Fr = FieldSpec(name="bn254_fr", modulus=FR_MODULUS)
Fq = FieldSpec(name="bn254_fq", modulus=FQ_MODULUS)

# G1 generator (affine), canonical ints
G1_GEN = (1, 2)
G1_B = 3

# G2 generator (affine over Fq2, c0 + c1*u), canonical ints
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)
# G2 curve coefficient b2 = 3 / (9 + u)
G2_B = (
    19485874751759354771024239261021720505790618469301721065564631296452457478373,
    266929791119991161246907387137283842545076965332900288569378510910307636690,
)

# BN parameter (for pairing): t such that p = 36t^4+36t^3+24t^2+6t+1
BN_U = 4965661367192848881

# non-residue for Fq2 = Fq[u]/(u^2 + 1): u^2 = -1
# Fq6 = Fq2[v]/(v^3 - xi), xi = 9 + u
XI = (9, 1)

FR_S = 28  # 2-adicity of Fr - 1
FR_GENERATOR = 7  # multiplicative generator of Fr (halo2_curves bn256::Fr)
