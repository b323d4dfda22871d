"""Persistent XLA compilation cache.

Layered-decoder graphs can take minutes to compile on remote-compile TPU
backends; the persistent cache makes every process after the first start in
milliseconds.  Called by the entry points (bench, CLI, graft entry) — not on
package import, to stay side-effect free for library users.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "LDPC_TPU_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "ldpcgputegra_tpu", "xla"
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
