"""Make JAX_PLATFORMS authoritative.

The axon sitecustomize imports jax at interpreter start and pins the
platform list to "axon,cpu", silently overriding a user's
``JAX_PLATFORMS=cpu``.  Entry points call this to restore env-var
semantics before any backend initializes.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backends already initialized; too late to change
