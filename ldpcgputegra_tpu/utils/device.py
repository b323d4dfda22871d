"""Backend availability probe.

A dead TPU relay makes ``jax.devices()`` block forever; long-running tools
must probe in a subprocess (with a timeout) before touching the backend.
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["device_available"]


def device_available(timeout_s: int = 180) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
