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
    assert meta["kind"] == "multilinear_kzg"
    eqs = []
    for j in range(meta["num_tables"]):
        eqs.append(
            {c: jnp.asarray(data[f"eq{j}_{c}"]) for c in ("x", "y", "z")}
        )
    g1 = tuple(int(v) for v in meta["g1"])
    g2 = tuple(tuple(int(c) for c in pair) for pair in meta["g2"])
    ss = [tuple(tuple(int(c) for c in pair) for pair in pt) for pt in meta["ss"]]
    return KzgParams(g1=g1, eqs=eqs, g2=g2, ss=ss)
