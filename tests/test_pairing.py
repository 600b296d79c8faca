"""Pairing sanity: bilinearity e(aP, bQ) == e(P, Q)^{ab} via product checks."""

import pytest

from halo2_lasso_tpu.ops import pairing as pr
from halo2_lasso_tpu.ops.bn254 import G1_GEN, G2_GEN_X, G2_GEN_Y

G2_GEN = (G2_GEN_X, G2_GEN_Y)


def test_pairing_identity_product():
    # e(2G1, G2) * e(-2G1, G2)... via e(2G1, G2) * e(G1, -2G2)^{-1}:
    # check e(2G1, G2) * e(-G1, 2G2) == 1
    g1_2 = pr.g1_mul_host(G1_GEN, 2)
    g1_neg = pr._neg(G1_GEN)
    g2_2 = pr.g2_mul(G2_GEN, 2)
    assert pr.multi_pairing_is_one([(g1_2, G2_GEN), (g1_neg, g2_2)])


def test_pairing_nondegenerate():
    g1_2 = pr.g1_mul_host(G1_GEN, 2)
    g2_3 = pr.g2_mul(G2_GEN, 3)
    assert not pr.multi_pairing_is_one([(g1_2, g2_3), (pr._neg(G1_GEN), G2_GEN)])
    # e(2G1,3G2) * e(-6G1, G2) == 1
    g1_neg6 = pr._neg(pr.g1_mul_host(G1_GEN, 6))
    assert pr.multi_pairing_is_one([(g1_2, g2_3), (g1_neg6, G2_GEN)])
