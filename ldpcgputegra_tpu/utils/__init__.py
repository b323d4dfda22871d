"""Shared utilities."""

from .cache import enable_compile_cache
from .device import device_available
from .platform import apply_platform_env

__all__ = ["enable_compile_cache", "device_available", "apply_platform_env"]
