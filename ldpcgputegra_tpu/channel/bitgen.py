"""Info-bit generation (reference C6, ``CBitGenerator.cpp:23-39``)."""

from __future__ import annotations

import numpy as np

__all__ = ["generate_info_bits"]


def generate_info_bits(
    rng: np.random.Generator, batch: int, k: int, random_bits: bool = True
) -> np.ndarray:
    """[batch, K] info bits: random (``-random``) or all-zero."""
    if random_bits:
        return rng.integers(0, 2, size=(batch, k), dtype=np.int8)
    return np.zeros((batch, k), dtype=np.int8)
