"""Pallas TPU kernels — the hot decode path."""

from .pallas_layered import make_pallas_decoder, pallas_supported

__all__ = ["make_pallas_decoder", "pallas_supported"]
