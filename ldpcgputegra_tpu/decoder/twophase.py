"""Two-phase (compaction) early termination — the TPU-native EARLY_TERM.

The reference's EARLY_TERM breaks per CUDA thread (4 packed codewords,
``CUDA_2NMS_SIMD.cu:17``, break at ``CUDA_MS_SIMD.cu:242-245``): threads
that finish retire and free SM issue slots.  A TPU kernel has no analogue
— vector ops process every lane regardless, so in-kernel ET only pays off
once an ENTIRE batch tile converges, which at operating SNRs is gated by
the slowest of ~256+ codewords.

The TPU answer exploits the batch instead:

* phase 1 decodes the whole batch at a fixed ``k1`` iterations (no ET
  masking — cheapest kernel) and computes each frame's syndrome on
  device;
* the host fetches the per-frame convergence mask (one small transfer,
  overlappable with the next batch's dispatch) and re-decodes ONLY the
  unconverged frames at the full iteration budget.

Output semantics, precisely: frames whose syndrome is satisfied at
``k1`` return their ``k1``-depth bits — exactly a per-frame EARLY_TERM
exit (decoding is deterministic, and the in-kernel ET freeze likewise
stops them there when ``k1`` ≥ their convergence point).  Frames still
unconverged at ``k1`` are re-decoded at the full fixed budget; that
matches a per-frame-ET decoder whenever the hard decisions are stable
between the frame's first convergence and the budget — the typical case,
but NOT a structural guarantee (layered min-sum keeps updating APP after
the syndrome clears, and a post-convergence flip would make the two
differ; such a frame would usually re-enter the unconverged set anyway).
The expensive deep decode runs on the few-percent tail instead of the
whole batch: effective cost per frame approaches ``k1 + FER(k1) * iters``
instead of ``max_frame(iters_used)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec

__all__ = ["make_twophase_decoder", "syndrome_fn"]


def syndrome_fn(code: LdpcCode):
    """Jittable per-frame syndrome check: ``ok[B] = all checks satisfied``.

    Works on the ORIGINAL code's edge table (hard bits are in original
    column order at the decoder boundary)."""
    tables = [jnp.asarray(ci) for ci in code.class_idx]

    def ok(bits: jax.Array):  # [B, N] uint8
        good = None
        for ci in tables:
            par = bits[:, ci.reshape(-1)].reshape(
                bits.shape[0], ci.shape[0], ci.shape[1]
            )
            unsat = jnp.any(par.sum(axis=2) & 1, axis=1)
            good = ~unsat if good is None else (good & ~unsat)
        return good

    return ok


def make_twophase_decoder(
    code: LdpcCode,
    spec: LayeredSpec,
    k1: int = 5,
    backend: str = "auto",
    tail_pad: int = 128,
    interpret: bool = False,
):
    """Build ``decode(llr[B, N]) -> (bits[B, N] uint8, stats dict)``.

    ``spec.iters`` is the full budget; ``spec.early_term`` is implied (the
    phase structure IS the early termination).  ``stats`` reports phase-2
    frame count and the effective decoded-iterations per frame.
    """
    import dataclasses

    from . import make_decoder

    base = dataclasses.replace(spec, early_term=False)
    dec1 = make_decoder(
        code, dataclasses.replace(base, iters=k1), backend=backend,
        interpret=interpret,
    )
    dec2 = make_decoder(code, base, backend=backend, interpret=interpret)
    ok_fn = syndrome_fn(code)

    @jax.jit
    def phase1(llr):
        bits, _ = dec1(llr)
        return bits, ok_fn(bits)

    @jax.jit
    def phase2(llr, bits, gat, scat):
        """The whole phase-2 pipeline (gather + deep decode + scatter) as
        ONE jitted function: its executable is cached per bucket shape, so
        a throughput study that pre-warms the buckets times pure decode,
        never a remote recompile (ADVICE r3 #1)."""
        tail_bits, _ = dec2(jnp.take(llr, gat, axis=0))
        return bits.at[scat].set(tail_bits, mode="drop")

    def _bucket(n: int, b: int) -> int:
        """Tail batch size: the next power-of-two multiple of ``tail_pad``
        (capped at the padded full batch).  A raw ``pad-to-128`` would give
        a different phase-2 shape on almost every call, and dec2 (a jitted
        decoder) retraces+recompiles per new shape — on a remote compile
        service that puts seconds-to-minutes INSIDE the timed region of
        any throughput study.  Buckets bound the distinct shapes to
        log2(b/tail_pad)+1."""
        cap = -(-b // tail_pad) * tail_pad
        t = tail_pad
        while t < n:
            t *= 2
        return min(t, cap)

    def decode(llr, ref_bits: Optional[np.ndarray] = None):
        del ref_bits
        llr = jnp.asarray(llr, jnp.int8)  # stays on device throughout
        b = llr.shape[0]
        bits, ok = phase1(llr)
        # the per-frame mask is the ONLY host fetch (B bytes)
        bad = np.flatnonzero(~np.asarray(ok))
        tail = _bucket(bad.size, b) if bad.size else 0
        stats = {
            "phase2_frames": int(bad.size),
            # what the DEVICE decodes: phase 2 runs the BUCKETED tail
            # (power-of-two multiple of tail_pad), not bad.size frames —
            # the honest cost stat charges the bucketed batch
            "phase2_batch": int(tail),
            "eff_iters_per_frame": k1 + spec.iters * tail / max(b, 1),
            # the unbucketed ideal (what a perfectly-shaped phase 2 would
            # cost), kept for comparing against the k1 + FER(k1)*budget model
            "eff_iters_per_frame_ideal":
                k1 + spec.iters * bad.size / max(b, 1),
        }
        if bad.size == 0:
            return bits, stats
        # Both the gather AND the scatter run at the bucketed shape: the
        # first live ET study timed ~4.7 s/call because the old scatter
        # (`bits.at[bad].set(tail_bits[:bad.size])`) had a distinct
        # bad.size almost every call — a fresh executable per call on a
        # remote-compile backend.  Pad gather indices with frame 0 (its
        # redundant decode is discarded) and scatter indices with the
        # out-of-range value b, dropped by XLA scatter mode="drop", so the
        # whole phase-2 pipeline has one executable per bucket size.
        pad = tail - bad.size
        gat = jnp.asarray(
            np.concatenate([bad, np.zeros(pad, np.int64)]).astype(np.int32)
        )
        scat = jnp.asarray(
            np.concatenate([bad, np.full(pad, b, np.int64)]).astype(np.int32)
        )
        # device-side gather/decode/scatter: no LLR or bit array ever
        # crosses the host boundary
        out = phase2(llr, bits, gat, scat)
        return out, stats

    def warm_buckets(llr) -> list[int]:
        """Compile phase 1 and EVERY possible phase-2 bucket executable
        for this batch shape (dummy indices; results discarded).  Call
        before timing on a remote-compile backend: otherwise the first
        occurrence of each tail bucket puts a multi-second compile inside
        the timed region — exactly the pathology the round-3 ET study
        published as 2-5 Mbps (ADVICE r3 #1)."""
        llr = jnp.asarray(llr, jnp.int8)
        b = llr.shape[0]
        bits, _ = phase1(llr)
        cap = -(-b // tail_pad) * tail_pad
        sizes = []
        t = tail_pad
        while t < cap:
            sizes.append(t)
            t *= 2
        sizes.append(cap)
        for t in sizes:
            gat = jnp.zeros((t,), jnp.int32)
            scat = jnp.full((t,), b, jnp.int32)  # all dropped
            jax.block_until_ready(phase2(llr, bits, gat, scat))
        return sizes

    def decode_pipelined(llrs):
        """Decode a SEQUENCE of batches with software pipelining: every
        batch's phase 1 is dispatched up front (the device queue holds
        them), so each per-batch convergence-mask fetch — the one
        mandatory host round trip in the two-phase design, ~25 ms on a
        relayed backend — overlaps the other batches' phase-1 compute
        instead of serializing after it.  This is how a production sweep
        consumes the decoder (`sim/sweep.py`'s dispatch window does the
        same for whole sim steps); the serial `decode()` number on a
        relay measures RTT, not decode.

        Returns (list of bits arrays, aggregate stats dict)."""
        staged = [phase1(jnp.asarray(x, jnp.int8)) for x in llrs]
        # ONE host transfer for every batch's convergence mask: each
        # np.asarray(ok) costs a full ~25 ms round trip on the relay no
        # matter how well dispatch overlaps (round-4 measurement: the
        # per-batch-fetch version ran 12 batches in 0.415 s = 12 RTTs)
        all_ok = np.asarray(jnp.stack([ok for _, ok in staged]))
        outs = []
        agg = {"phase2_frames": 0, "phase2_batch": 0, "frames": 0}
        for i, (x, (bits, _ok)) in enumerate(zip(llrs, staged)):
            ok = all_ok[i]
            llr = jnp.asarray(x, jnp.int8)
            b = llr.shape[0]
            bad = np.flatnonzero(~ok)
            tail = _bucket(bad.size, b) if bad.size else 0
            agg["phase2_frames"] += int(bad.size)
            agg["phase2_batch"] += int(tail)
            agg["frames"] += b
            if bad.size == 0:
                outs.append(bits)
                continue
            pad = tail - bad.size
            gat = jnp.asarray(
                np.concatenate([bad, np.zeros(pad, np.int64)])
                .astype(np.int32)
            )
            scat = jnp.asarray(
                np.concatenate([bad, np.full(pad, b, np.int64)])
                .astype(np.int32)
            )
            outs.append(phase2(llr, bits, gat, scat))
        agg["eff_iters_per_frame"] = (
            k1 + spec.iters * agg["phase2_batch"] / max(agg["frames"], 1)
        )
        return outs, agg

    decode.warm_buckets = warm_buckets
    decode.pipelined = decode_pipelined
    return decode
