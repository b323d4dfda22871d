"""Honest device timing on remote/async TPU backends.

Three measurement hazards exist on tunneled TPU backends (observed on the
axon relay; none exist on directly-attached chips but the harness is safe
everywhere):

1. ``block_until_ready`` can return before remote execution finishes, so
   naive per-call timing measures dispatch latency, not compute;
2. the relay can short-circuit duplicate computations (same executable +
   same operands), so repeat-same-input loops measure cache hits;
3. any host fetch pays a fixed round-trip (~tens of ms), so single-call
   fetch timing overstates small kernels.

``measure_call`` defeats all three: K calls over *distinct* pre-staged
inputs, one tiny scalar fetch at the end, repeated for two values of K —
the per-call device time is the slope between them.

This replaces the reference's CUDA-event timing
(``code/gpu_fixed/timer/CTimer.cu:31-60``) whose role was the same: measure
device time, not host round trips.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["measure_call", "throughput_report"]


def _probe_fn():
    @jax.jit
    def probe(x):
        return jnp.sum(x.astype(jnp.int32))

    return probe


# Module-global so the salt sequence continues across SEPARATE
# measure_call invocations: a min-of-R outer loop re-measuring the same
# fn over the same input pool must not replay salt values — identical
# (executable, operands) pairs are exactly what the relay dedupes, and a
# deduped repeat would report a fraudulent minimum.
_SALT = [0]


def measure_call(
    fn: Callable,
    inputs: Sequence,
    k_small: int = 4,
    k_large: int = 20,
    repeats: int = 3,
) -> float:
    """Seconds per ``fn(input)`` call, slope-based and dedup-proof.

    ``fn`` must return an array (or tuple whose first element is one).
    ``inputs`` are device-resident distinct operands, cycled through.

    Dedup-proofing: cycling a small input pool would replay identical
    (executable, operands) pairs — exactly what the relay short-circuits,
    which would shrink the slope and inflate every derived Gbps figure.
    Every call therefore carries a fresh int32 salt operand folded into
    the OUTPUT as ``out + min(salt, 0)`` — exactly zero for the positive
    salts used, but not foldable (the salt is a traced scalar), so the
    salt stays live and no (executable, operands) pair ever repeats
    across calls, runs, or repeats.  The *input* is passed through
    untouched: perturbing it would change the measured work on
    data-dependent paths (early termination), where the decode time is a
    function of the LLR distribution being timed.
    """
    probe = _probe_fn()

    def first(out):
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def call(x, s):
        out = first(fn(x))
        return out + jnp.minimum(s, 0).astype(out.dtype)

    def next_salt():
        _SALT[0] += 1
        return jnp.asarray(_SALT[0] % 1_000_000 + 1, jnp.int32)

    # warm: compile the salted wrapper and probe, materialize inputs
    for x in inputs:
        float(probe(x))
    float(probe(call(inputs[0], next_salt())))

    def run(k: int) -> float:
        salts = [next_salt() for _ in range(k)]  # staged pre-timing
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = call(inputs[i % len(inputs)], salts[i])
        float(probe(out))
        return time.perf_counter() - t0

    t_small = min(run(k_small) for _ in range(repeats))
    t_large = min(run(k_large) for _ in range(repeats))
    return max((t_large - t_small) / (k_large - k_small), 1e-9)


def measure_host_call(
    fn: Callable,
    inputs: Sequence,
    k_small: int = 3,
    k_large: int = 12,
    warm: int = 2,
    repeats: int = 1,
) -> float:
    """Slope timing for HOST-DRIVEN decode paths (e.g. the two-phase
    compaction decoder), which cannot be wrapped in jit.

    Dedup-proofing here is structural: the warm-up, the k_small run and
    the k_large run consume pairwise-DISJOINT slices of ``inputs``, so
    within one measurement (repeats=1, the default) the device never
    sees a repeated (executable, operands) pair.  ``repeats > 1`` reuses
    the same slices and is only sound on directly-attached backends
    where no execution dedup exists — on a relayed backend (axon) it is
    auto-degraded to 1 rather than silently measuring cache hits.
    """
    if repeats > 1 and jax.devices()[0].platform not in ("cpu", "gpu", "tpu"):
        # relayed/tunneled platform: execution dedup makes slice reuse
        # measure cache hits, not compute — degrade loudly
        print(
            f"(WW) measure_host_call: repeats={repeats} is unsound on the "
            f"'{jax.devices()[0].platform}' relay platform (execution "
            "dedup); degrading to repeats=1"
        )
        repeats = 1
    need = warm + k_small + k_large
    assert len(inputs) >= need, f"need {need} distinct inputs, got {len(inputs)}"
    ofs_small, ofs_large = warm, warm + k_small

    def run(k: int, ofs: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(inputs[ofs + i])
        jax.block_until_ready(jnp.asarray(out[0]).sum())
        return time.perf_counter() - t0

    run(warm, 0)
    t_small = min(run(k_small, ofs_small) for _ in range(repeats))
    t_large = min(run(k_large, ofs_large) for _ in range(repeats))
    return max((t_large - t_small) / (k_large - k_small), 1e-9)


def throughput_report(
    seconds_per_call: float, frames: int, n: int
) -> dict:
    """Coded-throughput numbers in the reference's accounting
    (coded bits / wall time, ``code/gpu_fixed/main.cpp:311-315``)."""
    coded_bits = frames * n
    return {
        "ms_per_call": seconds_per_call * 1e3,
        "frames_per_s": frames / seconds_per_call,
        "coded_mbps": coded_bits / seconds_per_call / 1e6,
        "coded_gbps": coded_bits / seconds_per_call / 1e9,
    }
