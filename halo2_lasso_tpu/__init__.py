"""halo2-lasso-tpu: a TPU-native HyperPlonk + Lasso proving framework.

Public API (see ARCHITECTURE.md for the design and SURVEY.md for the
reference component mapping):

    from halo2_lasso_tpu.backend.hyperplonk import HyperPlonk, new_transcript
    from halo2_lasso_tpu.backend import PlonkishCircuitInfo, MockCircuit
    from halo2_lasso_tpu.frontend.builder import CircuitBuilder
    from halo2_lasso_tpu import lasso
    from halo2_lasso_tpu.lasso.tables import range_table, and_table, ...
    from halo2_lasso_tpu.pcs.multilinear_kzg import MultilinearKzg
"""

__version__ = "0.1.0"
