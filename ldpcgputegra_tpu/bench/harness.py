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
    Instead every call XORs its input with a fresh int salt inside one
    jitted wrapper, so no (executable, operands) pair ever repeats across
    calls, runs, or repeats.  The salted input is a same-shape, same-work
    LLR batch (decode runtime is data-independent at fixed iters); the XOR
    itself is one fused elementwise pass, <1% of any measured kernel.
    """
    probe = _probe_fn()
    x0 = inputs[0]
    int_salt = jnp.issubdtype(jnp.asarray(x0).dtype, jnp.integer)

    def first(out):
        return out[0] if isinstance(out, tuple) else out

    if int_salt:
        dt = jnp.asarray(x0).dtype

        @jax.jit
        def call(x, s):
            return first(fn(jnp.bitwise_xor(x, s)))

        def make_salt(i: int):
            return jnp.asarray(i % 125 + 1, dt)
    else:  # float inputs: add a tiny distinct offset instead

        @jax.jit
        def call(x, s):
            return first(fn(x + s))

        def make_salt(i: int):
            return jnp.asarray((i % 125 + 1) * 1e-6, jnp.asarray(x0).dtype)

    salt_counter = [0]

    def next_salt():
        salt_counter[0] += 1
        return make_salt(salt_counter[0])

    # warm: compile the salted wrapper and probe, materialize inputs
    for x in inputs:
        float(probe(x))
    float(probe(call(x0, next_salt())))

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
    repeats: int = 3,
) -> float:
    """Slope timing for HOST-DRIVEN decode paths (e.g. the two-phase
    compaction decoder), which cannot be wrapped in jit.

    Dedup-proofing here is structural: ``len(inputs)`` must be >=
    ``k_large`` and no input is ever passed twice within a run, so the
    device never sees a repeated (executable, operands) pair for the
    expensive phase-1 call.  (Across repeats the same pairs DO recur; the
    min-over-repeats then reflects any relay caching, so prefer repeats=1
    on relay backends if that matters — phase-2 tail batches differ run to
    run anyway, keeping the dominant work un-replayable.)
    """
    assert len(inputs) >= k_large, "need k_large distinct inputs"

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(inputs[i])
        jax.block_until_ready(jnp.asarray(out[0]).sum())
        return time.perf_counter() - t0

    run(2)  # warm
    t_small = min(run(k_small) for _ in range(repeats))
    t_large = min(run(k_large) for _ in range(repeats))
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
