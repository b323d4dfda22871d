"""Measured VPU/HBM ceilings for honest roofline accounting.

Round 1's roofline used a hand-"calibrated" ops-per-edge constant and
reported fractions of 1.3-2.5 — physically impossible, therefore useless
for ranking kernels (VERDICT "what's weak" #1).  The fix has two halves:

* this module MEASURES the chip's sustained element rate on the decoder's
  actual op mix (int32 sub/clip/abs/compare/min/xor/select chains on
  VMEM-resident data) with a tiny Pallas kernel, slope-timed over two
  different in-kernel repetition counts so call overhead cancels.  The VPU
  is VLIW and can co-issue independent vector ops, so the sustained rate
  on a real dependency structure is the only defensible ceiling — a
  one-op-per-cycle paper number under-states it, which is exactly how
  fractions climbed past 1;
* ``roofline.kernel_model`` counts ops structurally from the kernel body
  (no calibration; see the per-term breakdown there).

HBM bandwidth is probed with a big int8 copy kernel the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .harness import measure_call

__all__ = ["OPS_PER_REP", "measure_vpu_rate", "measure_hbm_bw"]

# Element-ops per repetition of the probe mix below (count the jnp calls:
# sub, clip(2), abs, cmp, xor, max, min, min, cmp, select, add, clip(2)).
OPS_PER_REP = 14

# Element-ops per repetition of the peak mix (add + max + min per
# accumulator — the shortest self-dependent sequence the decode kernels
# are made of; everything else is independent across accumulators).
PEAK_OPS_PER_REP = 3


def _peak_kernel(reps: int, lanes: int, x_ref, o_ref):
    """``lanes`` INDEPENDENT clip-accumulate chains: measures the VPU's
    true multi-port issue ceiling.  The decode-mix probe (``_mix_kernel``)
    topped out at 2.86 Tops/s on v5e while the REAL QC kernel sustained
    3.33 Tops/s of audited Mosaic vector-ALU ops (round 4,
    tools/audit_ops.py) — its chains carry longer serial runs than the
    scheduled kernel does, so it under-states the ceiling.  Three ops with
    only the accumulator carried exposes the full issue width."""
    accs = [x_ref[...] + ln for ln in range(lanes)]
    step = jnp.asarray(3, jnp.int32)

    def body(_, accs):
        return tuple(
            jnp.minimum(jnp.maximum(a + step, -127), 127) for a in accs
        )

    accs = jax.lax.fori_loop(0, reps, body, tuple(accs))
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[...] = acc


def _mix_kernel(reps: int, lanes: int, x_ref, o_ref):
    """`reps` repetitions of `lanes` INDEPENDENT decode-shaped op chains.

    One serial chain cannot exercise the VPU's VLIW co-issue: the first
    live-silicon suite run (round 3) showed real kernels beating the
    1-chain "ceiling" by 2.2-2.7x, because the decoder has many
    independent VREG rows in flight where the chain has one.  Interleaving
    `lanes` independent chains gives the compiler the same co-issue
    opportunity; the ceiling is the best rate over a lanes sweep.
    """
    chains = []
    for ln in range(lanes):
        v = x_ref[...] + ln
        m = jnp.full_like(v, 3 + ln)
        p = jnp.zeros_like(v)
        mn = jnp.full_like(v, 128)
        chains.append((v, m, p, mn))

    def body(_, carry):
        out = []
        for v, m, p, mn in carry:
            c = jnp.clip(v - m, -127, 127)  # sub + clip(2)
            a = jnp.abs(c)  # abs
            s = (c > 0).astype(jnp.int32)  # cmp
            p2 = p ^ s  # xor
            mn2 = jnp.minimum(jnp.maximum(a, mn), 31)  # max + min
            mn3 = jnp.minimum(mn2, a)  # min
            mag = jnp.where(a == mn3, mn2, mn3)  # cmp + select
            v2 = jnp.clip(c + mag, -127, 127)  # add + clip(2)
            out.append((v2, m, p2, mn3))
        return tuple(out)

    chains = jax.lax.fori_loop(0, reps, body, tuple(chains))
    acc = jnp.zeros_like(x_ref[...])
    for v, _, p, mn in chains:
        acc = acc + v + p + mn
    o_ref[...] = acc


def _probe_fn(reps: int, lanes: int, shape, peak: bool = False):
    kernel = functools.partial(
        _peak_kernel if peak else _mix_kernel, reps, lanes
    )

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            # 8 chains x 4 live [256,512] int32 arrays = 16 MiB of state
            # plus temps: the 16 MiB default scoped limit OOMs at lanes=8
            # (seen live round 3); v5e has ~128 MiB physical VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20,
            ),
        )(x)

    return fn


def _measure_rate_lanes(lanes: int, shape, r_small: int,
                        r_large: int, peak: bool = False) -> float | None:
    """Rate for one (chain count, block shape), or None if no trustworthy
    slope emerged.

    The slope difference must clear a noise floor before the rate is
    believed: on the relay the first live run produced t_large <= t_small
    at lanes=1 (sub-ms signal under ~25 ms RTT jitter), and the old 1e-9
    clamp turned that into an 8e17 ops/s "ceiling" that max() would have
    adopted.  If the signal is too small the repetition count is
    quadrupled (recompile, seconds) until the in-kernel work dominates;
    degenerate measurements are discarded, never returned.
    """
    key = jax.random.key(0)
    inputs = [
        jax.random.randint(jax.random.fold_in(key, i), shape, -31, 32,
                           jnp.int32)
        for i in range(4)
    ]
    n_elem = shape[0] * shape[1]
    per_rep = PEAK_OPS_PER_REP if peak else OPS_PER_REP
    for _ in range(4):
        t_small = measure_call(_probe_fn(r_small, lanes, shape, peak),
                               inputs, k_small=2, k_large=8)
        t_large = measure_call(_probe_fn(r_large, lanes, shape, peak),
                               inputs, k_small=2, k_large=8)
        dt = t_large - t_small
        # believe the slope only once the added reps dominate the base
        # call time AND are comfortably above timer/relay jitter
        if dt > max(0.5 * t_small, 2e-3):
            return n_elem * per_rep * lanes * (r_large - r_small) / dt
        r_small, r_large = r_small * 4, r_large * 4
    return None


def measure_vpu_rate() -> float:
    """Sustained int32 element-ops/s on the decode op mix (slope over the
    in-kernel repetition count, dedup-proof via measure_call's salting).

    Sweeps block shape x interleaved-chain count and returns the BEST
    sustained rate: the roofline ceiling must upper-bound any dependency
    structure a real kernel can present.  Two regimes matter (live
    finding, round 4): at [256,512] blocks every op streams VMEM and the
    probe under-reports issue capability by ~2.5x (real kernels beat that
    "ceiling"); vreg-scale blocks ([8,128]..[64,256]) with many
    independent chains keep the working set register-resident and expose
    the VPU's true multi-port issue rate.  Repetition counts are scaled so
    each call carries ~2e9 ops at an assumed ~4 Tops/s — big enough for a
    clean slope over relay jitter, small enough to stay fast.
    """
    best = 0.0
    mix_shapes = ((8, 128), (8, 256), (64, 256), (256, 512))
    peak_shapes = ((8, 128), (8, 256), (64, 256))
    sweeps = [(s, ln, False) for s in mix_shapes for ln in (1, 2, 4, 8, 16)]
    sweeps += [(s, ln, True) for s in peak_shapes for ln in (8, 16, 32)]
    for shape, lanes, peak in sweeps:
        n_elem = shape[0] * shape[1]
        if lanes * n_elem > (256 * 512 * 8):
            continue  # cap live state at the known-good 16 MiB
        per_rep = PEAK_OPS_PER_REP if peak else OPS_PER_REP
        r_large = max(16, int(2e9 / (per_rep * n_elem * lanes)))
        r_small = max(2, r_large // 8)
        tag = "peak" if peak else "mix"
        try:
            rate = _measure_rate_lanes(lanes, shape, r_small, r_large,
                                       peak)
        except Exception as e:  # noqa: BLE001 — one config must not
            # forfeit the sweep (lanes=8 OOMed the first live run)
            print(f"(WW) vpu probe {tag} {shape} x{lanes} failed: {e}",
                  flush=True)
            continue
        if rate is None:
            print(f"(WW) vpu probe {tag} {shape} x{lanes}: no trustworthy "
                  "slope, discarded", flush=True)
            continue
        print(f"(II) vpu probe {tag} {shape} x{lanes}: {rate/1e12:.2f} "
              "Tops/s", flush=True)
        best = max(best, rate)
    if best == 0.0:
        raise RuntimeError("vpu probe: every probe config degenerate")
    return best


def _copy_fn(mb: int):
    # int32 elements: Mosaic vector arith supports only i16/i32 (the +1
    # that defeats copy elision crashed the remote compile on int8, round 4)
    shape = (mb << 18,)

    @jax.jit
    def fn(x):
        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1

        return pl.pallas_call(
            kernel,
            grid=(mb,),
            in_specs=[pl.BlockSpec((1 << 18,), lambda i: (i,))],
            out_specs=pl.BlockSpec((1 << 18,), lambda i: (i,)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )(x)

    return fn


def measure_hbm_bw(mb: int = 256) -> float:
    """Sustained HBM bytes/s (read+write) on a 1 MiB-blocked int32 stream.

    A 256 MiB copy at ~800 GB/s is only ~0.6 ms — a handful of calls sits
    under the relay's timing jitter and the slope clamps to its 1e-9
    floor, which round 4 saw reported as 5e17 B/s.  The call count is
    escalated until the result drops below an 8 TB/s physical sanity
    ceiling (no v5e-class part is within 4x of it); degenerate
    measurements raise instead of poisoning the roofline."""
    key = jax.random.key(1)
    inputs = [
        jax.random.randint(jax.random.fold_in(key, i), (mb << 18,), -100,
                           100, jnp.int32)
        for i in range(4)
    ]
    fn = _copy_fn(mb)
    for ks, kl in ((4, 32), (8, 64), (16, 128)):
        sec = measure_call(fn, inputs, k_small=ks, k_large=kl)
        bw = 2 * (mb << 20) / sec
        if bw < 8e12:
            return bw
        print(f"(WW) hbm probe k={kl}: {bw:.3g} B/s is unphysical "
              "(slope under jitter); escalating call count", flush=True)
    raise RuntimeError("hbm probe: slope stayed under relay jitter")
