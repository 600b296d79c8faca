"""Parameter / proof serialization.

The reference serializes all Param/ProverParam/VerifierParam via serde +
bincode (SURVEY.md §5; backend.rs:18-19, pcs.rs:23-25) so SRS and keys can
be stored and reloaded; proofs are plain byte vectors. Here params are
stored as npz archives of limb arrays + a JSON side-car for host values
(G2 points, sizes); proofs are bytes already.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from halo2_lasso_tpu.pcs.multilinear_kzg import (
    KzgParams,
    KzgProverParams,
    KzgVerifierParams,
)


def save_kzg_params(path: str, params: KzgParams) -> None:
    arrays = {}
    for j, table in enumerate(params.eqs):
        for coord in ("x", "y", "z"):
            arrays[f"eq{j}_{coord}"] = np.asarray(table[coord])
    meta = {
        "kind": "multilinear_kzg",
        "num_tables": len(params.eqs),
        "g1": [str(v) for v in params.g1],
        "g2": [[str(c) for c in pair] for pair in params.g2],
        "ss": [[[str(c) for c in pair] for pair in pt] for pt in params.ss],
    }
    assert not path.endswith(".npz"), "pass a base path without extension"
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_kzg_params(path: str) -> KzgParams:
    """`path` is the base path used in save_kzg_params (no extension)."""
    data = np.load(path + ".npz")
    with open(path + ".json") as f:
        meta = json.load(f)
    if meta.get("kind") != "multilinear_kzg":  # not assert: survives python -O
        raise ValueError(f"params at {path} are {meta.get('kind')!r}, not multilinear_kzg")
    eqs = []
    for j in range(meta["num_tables"]):
        eqs.append(
            {c: jnp.asarray(data[f"eq{j}_{c}"]) for c in ("x", "y", "z")}
        )
    g1 = tuple(int(v) for v in meta["g1"])
    g2 = tuple(tuple(int(c) for c in pair) for pair in meta["g2"])
    ss = [tuple(tuple(int(c) for c in pair) for pair in pt) for pt in meta["ss"]]
    return KzgParams(g1=g1, eqs=eqs, g2=g2, ss=ss)


# ---------------------------------------------------------------------------
# HyperPlonk prover/verifier params (reference: HyperPlonkProverParam /
# HyperPlonkVerifierParam are serde+bincode, backend/hyperplonk.rs:39-74)
# ---------------------------------------------------------------------------


def save_hyperplonk_params(path: str, pp, vp) -> None:
    """Store a (pp, vp) pair produced by HyperPlonk.preprocess over the
    MultilinearKzg PCS. `path` is a base path (no extension)."""
    from halo2_lasso_tpu.expression import expression_to_obj

    assert not path.endswith(".npz"), "pass a base path without extension"
    arrays = {}
    for j, table in enumerate(pp.pcs.eqs):
        for c in ("x", "y", "z"):
            arrays[f"eq{j}_{c}"] = np.asarray(table[c])
    for i, poly in enumerate(pp.preprocess_polys):
        arrays[f"pre{i}"] = np.asarray(poly)
    for i, (_, poly) in enumerate(pp.permutation_polys):
        arrays[f"perm{i}"] = np.asarray(poly)
    meta = {
        "kind": "hyperplonk_kzg",
        "num_tables": len(pp.pcs.eqs),
        "g1": [str(v) for v in pp.pcs.g1],
        "g2": [[str(c) for c in pair] for pair in vp.pcs.g2],
        "ss": [[[str(c) for c in pair] for pair in pt] for pt in vp.pcs.ss],
        "num_instances": pp.num_instances,
        "num_witness_polys": pp.num_witness_polys,
        "num_challenges": pp.num_challenges,
        "lookups": [
            [[expression_to_obj(i), expression_to_obj(t)] for i, t in lookup]
            for lookup in pp.lookups
        ],
        "num_permutation_z_polys": pp.num_permutation_z_polys,
        "num_vars": pp.num_vars,
        "expression": expression_to_obj(pp.expression),
        "preprocess_comms": [[str(x), str(y)] for x, y in pp.preprocess_comms],
        "permutation_idx": [i for i, _ in pp.permutation_polys],
        "permutation_comms": [[str(x), str(y)] for x, y in pp.permutation_comms],
    }
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


# ---------------------------------------------------------------------------
# Lasso setup (structured table spec + PCS params). Tables are closed-form
# (Surge subtables materialize from their factory), so the spec — factory
# name + kwargs — is the whole serialization (reference analogue:
# backend.rs:18-19 bounds all params by serde; here the table side needs no
# arrays at all).
# ---------------------------------------------------------------------------


def save_lasso_setup(path: str, table, params: KzgParams) -> None:
    """Store a Lasso setup: the structured table's factory spec + KZG params.
    `table` must carry a `spec` attribute (set by the factories in
    lasso/tables.py). `path` is a base path (no extension)."""
    spec = getattr(table, "spec", None)
    if spec is None:
        raise ValueError(
            f"table {table.name!r} has no factory spec; only factory-built "
            "structured tables are serializable"
        )
    save_kzg_params(path, params)
    with open(path + ".lasso.json", "w") as f:
        json.dump({"kind": "lasso_setup", "table": spec}, f)


def load_lasso_setup(path: str):
    """Returns (table, params) equivalent to the stored setup."""
    from halo2_lasso_tpu.lasso import tables as T

    with open(path + ".lasso.json") as f:
        meta = json.load(f)
    assert meta["kind"] == "lasso_setup"
    factory = getattr(T, meta["table"]["factory"])
    table = factory(**meta["table"]["kwargs"])
    return table, load_kzg_params(path)


def load_hyperplonk_params(path: str):
    """Returns (pp, vp) equivalent to the stored pair."""
    from halo2_lasso_tpu.backend.hyperplonk import (
        HyperPlonkProverParam,
        HyperPlonkVerifierParam,
    )
    from halo2_lasso_tpu.expression import expression_from_obj

    data = np.load(path + ".npz")
    with open(path + ".json") as f:
        meta = json.load(f)
    assert meta["kind"] == "hyperplonk_kzg"
    eqs = [
        {c: jnp.asarray(data[f"eq{j}_{c}"]) for c in ("x", "y", "z")}
        for j in range(meta["num_tables"])
    ]
    g1 = tuple(int(v) for v in meta["g1"])
    g2 = tuple(tuple(int(c) for c in pair) for pair in meta["g2"])
    ss = [tuple(tuple(int(c) for c in pair) for pair in pt) for pt in meta["ss"]]
    pcs_pp = KzgProverParams(g1=g1, eqs=eqs)
    pcs_vp = KzgVerifierParams(g1=g1, g2=g2, ss=ss)
    expression = expression_from_obj(meta["expression"])
    preprocess_polys = []
    i = 0
    while f"pre{i}" in data:
        preprocess_polys.append(jnp.asarray(data[f"pre{i}"]))
        i += 1
    perm_idx = meta["permutation_idx"]
    permutation_polys = [
        (idx, jnp.asarray(data[f"perm{i}"])) for i, idx in enumerate(perm_idx)
    ]
    preprocess_comms = [(int(x), int(y)) for x, y in meta["preprocess_comms"]]
    permutation_comms = [(int(x), int(y)) for x, y in meta["permutation_comms"]]
    lookups = [
        [
            (expression_from_obj(i), expression_from_obj(t))
            for i, t in lookup
        ]
        for lookup in meta["lookups"]
    ]
    common = dict(
        num_instances=list(meta["num_instances"]),
        num_witness_polys=list(meta["num_witness_polys"]),
        num_challenges=list(meta["num_challenges"]),
        num_permutation_z_polys=meta["num_permutation_z_polys"],
        num_vars=meta["num_vars"],
        expression=expression,
    )
    pp = HyperPlonkProverParam(
        pcs=pcs_pp,
        lookups=lookups,
        preprocess_polys=preprocess_polys,
        preprocess_comms=preprocess_comms,
        permutation_polys=permutation_polys,
        permutation_comms=permutation_comms,
        **common,
    )
    vp = HyperPlonkVerifierParam(
        pcs=pcs_vp,
        num_lookups=len(lookups),
        preprocess_comms=preprocess_comms,
        permutation_comms=list(zip(perm_idx, permutation_comms)),
        **common,
    )
    return pp, vp
