"""Framework configuration flags.

The reference's config surface is Cargo features (`parallel`, `timer`,
`frontend-halo2`, `benchmark`, `sanity-check` — plonkish_backend/
Cargo.toml:34-44). Equivalents here are env vars / runtime toggles:

  HALO2_LASSO_TPU_TIMER=1    — hierarchical phase timers (utils/timer.py)
  HALO2_LASSO_TPU_SANITY=1   — prover-internal debug assertions (the
                               `sanity-check` feature: e.g. sum(h)=0,
                               z*product=1, commit/eval consistency)
"""

import os

SANITY_CHECK = os.environ.get("HALO2_LASSO_TPU_SANITY", "0") == "1"


def sanity_enabled() -> bool:
    return SANITY_CHECK


def set_sanity(flag: bool):
    global SANITY_CHECK
    SANITY_CHECK = flag
