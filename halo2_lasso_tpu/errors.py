"""Common base for the library's error types.

Reference analogue: the single `Error` enum (/root/reference/
plonkish_backend/src/lib.rs:12-20). Here each layer keeps its specific
exception class, all rooted at `Halo2LassoError` so callers (and the
negative tests) can distinguish a clean protocol rejection from an
unrelated bug.
"""


class Halo2LassoError(Exception):
    pass
