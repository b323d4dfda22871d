"""Shared utilities."""

from .cache import enable_compile_cache
from .device import device_available

__all__ = ["enable_compile_cache", "device_available"]
