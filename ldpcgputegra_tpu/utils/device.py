"""Backend availability probe.

A dead TPU relay makes ``jax.devices()`` block forever; long-running tools
must probe in a subprocess (with a timeout) before touching the backend.
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["device_available"]

# The axon sitecustomize pins the platform at interpreter startup, so a
# plain ``import jax`` ignores JAX_PLATFORMS; re-apply it explicitly so
# CPU-forced runs (tests, smoke runs) probe the backend they will use
# (same pattern as sim/cli.py).
_PROBE = (
    "import os, jax\n"
    "p = os.environ.get('JAX_PLATFORMS')\n"
    "if p: jax.config.update('jax_platforms', p)\n"
    "jax.devices()\n"
)


def device_available(timeout_s: int = 180) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
