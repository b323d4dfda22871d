"""Golden (reference-semantics) fixed-point decoder oracles.

``decode_golden`` — readable NumPy specification (slow, scalar).
``decode_oracle`` — batched dispatcher: native C++ oracle when built,
NumPy fallback otherwise.  Both are bit-identical by test contract.
"""

from __future__ import annotations

import numpy as np

from .decoder import GoldenParams, decode_golden, syndrome_ok  # noqa: F401


def decode_oracle(code, llr_batch, params: GoldenParams = GoldenParams()):
    """Batched golden decode [B, N] -> (bits [B, N] int8, iters_used [B])."""
    from .native import decode_golden_native, native_available

    llr_batch = np.asarray(llr_batch)
    if llr_batch.ndim == 1:
        llr_batch = llr_batch[None, :]
    if native_available():
        return decode_golden_native(code, llr_batch, params)
    bits = np.empty_like(llr_batch)
    used = np.empty(llr_batch.shape[0], np.int32)
    for b in range(llr_batch.shape[0]):
        bits[b], used[b] = decode_golden(code, llr_batch[b], params)
    return bits, used
