"""Fused layered min-sum decoder as a single Pallas TPU kernel (QC codes).

The entire decode — all iterations, all layers — runs inside one kernel
with the APP array and every c2v message resident in VMEM; HBM sees one
read of the LLR block and one write of the hard-decision block per batch
tile.  This is the TPU-native answer to the reference's CUDA kernel family
(``code/gpu_fixed/decoder_ms/cuda/CUDA_MS_SIMD.cu:25-248``), whose one
thread walks every check for 4 int8-packed codewords; here one *chip*
walks every QC block-row for a whole lane-tile of codewords:

* codewords ride the lane axis (TB per tile, 128-aligned) — the analogue
  of the 4-codeword int8x4 packing x 128-thread blocks (P1/P2);
* the APP array is laid out [Nb, Z, TB] (block-column major); the QC
  structure turns every edge's VN gather into a *static sublane roll* of
  one [Z, TB] slab — no dynamic indexing anywhere;
* the layered (turbo) schedule's in-place APP update is preserved exactly:
  block-rows are processed sequentially, and checks within one block-row
  touch pairwise-disjoint VNs, so vectorizing over Z x TB is bit-identical
  to the reference's sequential check loop (SURVEY §7 "hard parts" #1);
* arithmetic: int32 compute (Mosaic sublane rotates need 32-bit data) on
  int8 message storage; saturation defaults SAT_VAR=±127 / SAT_MSG=±31
  (``constantes_sse.h:43-49``, configurable), variant math per
  ``CUDA_{MS,OMS,NMS,2NMS}_SIMD.cu`` — NMS/2NMS multiply-truncate is the
  integer-exact (x*3)>>2 / (x*7)>>3;
* optional early termination (the per-codeword generalisation of
  EARLY_TERM's per-thread break, ``CUDA_2NMS_SIMD.cu:17``): instead of
  masking every APP/message write with a per-lane freeze mask (the round-3
  design, which cost 3-4x on silicon — VERDICT r3 weak #2), converged
  lanes' hard decisions are SNAPSHOTTED into an int8 bit buffer the
  iteration their syndrome first clears, the decode loop runs unmasked,
  and the output selects snapshot vs live bits per lane.  Decoding past
  convergence cannot corrupt the result (the snapshot is the contract,
  exactly the golden model's "stop here" semantics), whole iterations are
  still predicated off once every lane in the tile has converged, and the
  hot loop carries ZERO extra work per edge.

Non-QC codes fall back to the XLA gather path in ``ops.layered``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.code import LdpcCode
from ..golden.decoder import SAT_MSG, SAT_VAR
from ..ops.layered import LayeredSpec

__all__ = ["make_pallas_decoder", "pallas_supported"]

_CT = jnp.int32  # compute dtype (sublane rotates require 32-bit data)
_ST = jnp.int8  # storage dtype (messages; APP state is kept int32 in VMEM)


def pallas_supported(code: LdpcCode, spec: LayeredSpec) -> bool:
    """True when every layer of the (reference) schedule is a QC block-row."""
    if spec.schedule not in ("auto", "reference"):
        return False
    return code.Z is not None and all(l.qc is not None for l in code.layers)


def _roll(x, s: int, Z: int):
    """Static cyclic roll along axis 0 (sublanes) of a [Z, TB] tile."""
    if s % Z == 0:
        return x
    return pltpu.roll(x, -s % Z, axis=0)


def _roll_mod(x, s: int, Z: int, Zp: int):
    """Cyclic mod-Z roll of the first Z rows of a [Zp, TB] tile
    (Zp = Z padded up to a sublane multiple; rows >= Z are don't-care).

    Mosaic's sublane rotate on a non-8-multiple row count is slow and
    the unpadded layout wastes tile capacity — 1944x972's Z=81 ran 1.6x
    more ps/edge than its own base re-expanded at Z=88 (PROFILE_1944.md).
    Two ALIGNED Zp-rolls + one iota select emulate the mod-Z roll
    exactly: out[i] = x[(i+s) mod Zp] lands the right element for
    i < Z-s, and x[(i+s-Z) mod Zp] for the wrapped tail; dummy rows are
    never selected into real rows (both branches read x[<Z] there), so
    garbage stays confined to rows >= Z."""
    s = s % Z
    if Zp == Z:
        return _roll(x, s, Z)
    if s == 0:
        return x
    y1 = _roll(x, s, Zp)
    y2 = _roll(x, (s - Z) % Zp, Zp)
    i = jax.lax.broadcasted_iota(jnp.int32, (Zp, 1), 0)
    return jnp.where(i >= Z - s, y2, y1)


def _row_mask(Z: int, rows) -> jax.Array:
    """[Z, 1] bool mask selecting the given check rows, built from iota
    (Pallas kernels cannot capture array constants)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (Z, 1), 0)
    m = None
    for r in np.asarray(rows).tolist():
        e = i == r
        m = e if m is None else (m | e)
    return m


def _f_consts(min1, min2, spec: LayeredSpec):
    """Message magnitudes (f1 = min edge, f2 = others); integer-exact forms
    of the variant math in CUDA_{MS,OMS,NMS,2NMS}_SIMD.cu (see ops.layered)."""
    if spec.algo == "MS":
        return (
            jnp.minimum(min2, spec.sat_msg),
            jnp.minimum(min1, spec.sat_msg),
        )
    if spec.algo == "OMS":
        f1 = jnp.minimum(jnp.maximum(min2 - spec.offset, 0), spec.sat_msg)
        f2 = jnp.minimum(jnp.maximum(min1 - spec.offset, 0), spec.sat_msg)
        return f1, f2
    if spec.algo == "NMS":
        return (min2 * spec.nms_f) >> 5, (min1 * spec.nms_f) >> 5
    if spec.algo == "2NMS":
        return (min2 * spec.nms_f2) >> 5, (min1 * spec.nms_f) >> 5
    raise ValueError(f"unknown algo {spec.algo!r}")


# NOTE on a measured-negative experiment (round 4): a "delta-shift"
# schedule — keep each block-column's APP slab in its last edge's check
# frame and roll only by static shift deltas, halving per-edge rolls —
# was implemented, bit-exact-validated, and benchmarked on silicon.  It
# LOST: rolls are only ~2 of the ~23 audited VPU ops per edge (~6% of
# kernel time), while the pre/post rotations cost 10-15% whether done
# per-column in-kernel (Nb serial [Z,TB] ops swamp small-Z tiles: 576
# ran 2x slower) or as XLA-side row-permutation gathers (extra HBM
# passes: 576 -13%, 64800@5it -17% end-to-end).  Reverted at commit
# history 06061eb..3f18f8b; the snapshot-ET redesign from the same
# commits is kept (that one measured a large win).


def _build_kernel(code: LdpcCode, spec: LayeredSpec, Z: int, TB: int,
                  emit_mask: bool = False):
    layers = code.layers  # all QC (checked by pallas_supported)
    Nb = code.N // Z
    # odd-Z codes (1944x972's Z=81 is the registry's only one) run on a
    # sublane-aligned Zp = ceil(Z/8)*8 layout with emulated mod-Z rolls
    # (see _roll_mod); rows >= Z are dummy and masked out of the parity
    Zp = -(-Z // 8) * 8

    def layer_pass(v_ref, m_ref, moff: int, layer):
        """One QC block-row; returns [Zp, TB] int32 parity (0 = satisfied;
        dummy rows >= Z already masked)."""
        cols = layer.qc.cols.tolist()
        shifts = layer.qc.shifts.tolist()
        deg = layer.deg
        me = layer.qc.mask_edge
        mrow = None
        if me is not None:
            mrow = _row_mask(Zp, layer.qc.mask_rows)  # deficient circulant
        cmask = None
        if layer.qc.commit_rows is not None:
            cmask = _row_mask(Zp, layer.qc.commit_rows)  # sub-pass commits
        sv, sm = spec.sat_var, spec.sat_msg
        rolled = []
        contribs = []
        for j in range(deg):
            v = _roll_mod(v_ref[cols[j]], shifts[j], Z, Zp)  # int32 slab
            m = m_ref[moff + j].astype(_CT)
            c = jnp.clip(v - m, -sv, sv)
            if me is not None and j == me:
                # neutralize the nonexistent edge: -SAT_VAR is parity-
                # neutral (sign 0) and never the min (see codes/code.py)
                c = jnp.where(mrow, -sv, c)
            rolled.append(v)
            contribs.append(c)
        # running two-min + sign parity (order == CUDA_MS_SIMD.cu:165-171)
        mags = []
        sgns = []
        min1 = min2 = None
        for j, c in enumerate(contribs):
            if spec.minclamp == "pre":
                a = jnp.abs(jnp.clip(c, -sm, sm))
            else:
                a = jnp.abs(c)
            s = (c > 0).astype(_CT)
            mags.append(a)
            sgns.append(s)
            if j == 0:
                min1 = a
                min2 = jnp.full_like(a, sv + 1)
            else:
                min2 = jnp.minimum(min2, jnp.maximum(a, min1))
                min1 = jnp.minimum(min1, a)
        parity = sgns[0]
        for s in sgns[1:]:
            parity = parity ^ s
        f1, f2 = _f_consts(min1, min2, spec)
        v_news = []
        upd_masks = []
        for j in range(deg):
            mag = jnp.where(mags[j] == min1, f1, f2)
            m_new = jnp.where((parity ^ sgns[j]) == 1, mag, -mag)
            if spec.minclamp == "pre":
                m_new = jnp.clip(m_new, -sm, sm)
            v_new = jnp.clip(contribs[j] + m_new, -sv, sv)
            upd = None
            if me is not None and j == me:
                v_new = jnp.where(mrow, rolled[j], v_new)
                m_new = jnp.where(mrow, m_ref[moff + j].astype(_CT), m_new)
                upd = ~mrow if upd is None else (upd & ~mrow)
            if cmask is not None:
                v_new = jnp.where(cmask, v_new, rolled[j])
                m_new = jnp.where(cmask, m_new, m_ref[moff + j].astype(_CT))
                upd = cmask if upd is None else (upd & cmask)
            v_news.append(v_new)
            upd_masks.append(upd)
            m_ref[moff + j] = m_new.astype(_ST)
        # Writeback: a repeated block-column needs a MERGED write — each
        # edge's full-slab store would clobber the other's committed
        # updates (both computed from the layer-start slab).  Updates of
        # distinct edges in a conflict-free group touch disjoint VNs, so
        # sequential where-merges are exact.
        col_edges: dict[int, list[int]] = {}
        for j in range(deg):
            col_edges.setdefault(cols[j], []).append(j)
        for col, js in col_edges.items():
            if len(js) == 1:
                j = js[0]
                v_ref[col] = _roll_mod(v_news[j], Z - shifts[j], Z, Zp)
            else:
                slab = v_ref[col]
                for j in js:
                    back = _roll_mod(v_news[j], Z - shifts[j], Z, Zp)
                    upd = upd_masks[j]
                    if upd is None:
                        slab = back
                    else:
                        upd_b = jnp.broadcast_to(
                            upd.astype(jnp.int32), back.shape
                        )  # rotate as int32 (Mosaic: no sub-32-bit rolls)
                        slab = jnp.where(
                            _roll_mod(upd_b, Z - shifts[j], Z, Zp) != 0,
                            back, slab,
                        )
                v_ref[col] = slab
        if cmask is not None:
            parity = jnp.where(cmask, parity, 0)
        if Zp != Z:
            # dummy rows' parity is garbage — mask it from the ET vote
            i = jax.lax.broadcasted_iota(jnp.int32, (Zp, 1), 0)
            parity = jnp.where(i < Z, parity, 0)
        return parity

    def syndrome_pass(v_ref, layer):
        """[Zp, TB] TRUE-syndrome parity of one layer from the current
        APP hard decisions (bit = app > 0): roll + sign + xor per edge —
        ~3 VPU ops/edge vs ~23 for a decode iteration.  Runs ONCE after
        the final iteration in emit_mask mode; masking rules (deficient
        circulants, sub-pass commit rows, dummy Zp rows) mirror
        ``layer_pass`` so every check is counted exactly once."""
        cols = layer.qc.cols.tolist()
        shifts = layer.qc.shifts.tolist()
        me = layer.qc.mask_edge
        mrow = _row_mask(Zp, layer.qc.mask_rows) if me is not None else None
        par = None
        for j in range(layer.deg):
            v = _roll_mod(v_ref[cols[j]], shifts[j], Z, Zp)
            s = (v > 0).astype(_CT)
            if me is not None and j == me:
                s = jnp.where(mrow, 0, s)  # nonexistent edge: no bit
            par = s if par is None else par ^ s
        if layer.qc.commit_rows is not None:
            par = jnp.where(_row_mask(Zp, layer.qc.commit_rows), par, 0)
        if Zp != Z:
            i = jax.lax.broadcasted_iota(jnp.int32, (Zp, 1), 0)
            par = jnp.where(i < Z, par, 0)
        return par

    def kernel(llr_ref, out_ref, iters_ref, *rest):
        if emit_mask:
            ok_ref, *rest = rest
        v_ref, m_ref, unsat_ref, cnt_ref, *et_scratch = rest
        b_save_ref = et_scratch[0] if spec.early_term else None
        # load LLRs into the VMEM-resident int32 APP state; zero the
        # messages
        v_ref[...] = llr_ref[...].astype(_CT)
        m_ref[...] = jnp.zeros_like(m_ref)
        cnt_ref[0] = jnp.asarray(0 if spec.early_term else spec.iters,
                                 jnp.int32)
        if spec.early_term:
            unsat_ref[...] = jnp.ones_like(unsat_ref)
            b_save_ref[...] = jnp.zeros_like(b_save_ref)

        def run_layers():
            unsat = None
            moff = 0
            for layer in layers:
                parity = layer_pass(v_ref, m_ref, moff, layer)
                moff += layer.deg
                if spec.early_term:
                    # accumulate the unsatisfied-check OR at [Z, TB]
                    # granularity; reduce to lanes once per iteration
                    # (Mosaic has no int16 reductions -> via int32)
                    unsat = (
                        parity
                        if unsat is None
                        else jnp.maximum(unsat, parity)
                    )
            return unsat

        def iteration(it, _):
            del it
            if not spec.early_term:
                run_layers()
                return 0
            active = unsat_ref[0] != 0  # [TB] lane mask

            @pl.when(jnp.any(active))
            def _():
                unsat = run_layers()
                lane_unsat = unsat.max(axis=0)  # [TB] (int32)
                new_unsat = jnp.minimum(unsat_ref[0], lane_unsat)
                # snapshot hard decisions of lanes whose syndrome just
                # cleared; the decode loop itself runs UNMASKED (frozen
                # lanes keep decoding, their output comes from the
                # snapshot — exactly the golden model's per-frame break)
                jf = active & (new_unsat == 0)  # [TB]
                unsat_ref[0] = new_unsat
                cnt_ref[0] = cnt_ref[0] + 1

                @pl.when(jnp.any(jf))
                def _():
                    b_save_ref[...] = jnp.where(
                        jf[None, None, :],
                        (v_ref[...] > 0).astype(_ST),
                        b_save_ref[...],
                    )
            return 0

        jax.lax.fori_loop(0, spec.iters, iteration, 0, unroll=False)
        # fused deinterleave+hard-decision equivalent: bit = (app > 0);
        # the ET snapshot is stored in the same (frame-0) layout, so the
        # select needs no alignment step.
        if spec.early_term:
            frozen = (unsat_ref[0] == 0)[None, None, :]
            out_ref[...] = jnp.where(
                frozen, b_save_ref[...], (v_ref[...] > 0).astype(_ST)
            )
        else:
            out_ref[...] = (v_ref[...] > 0).astype(_ST)
        if emit_mask:
            # TRUE syndrome of the output hard decisions, computed
            # in-kernel (~3 ops/edge, once — ~1% of a 10-iter decode):
            # routing on it sends strictly the non-codeword frames to
            # phase 2.  (The reference's on-the-fly EARLY_TERM parity
            # word was measured far more conservative on silicon: at
            # 576x288/3.0dB/k1=5 it flagged 33% of frames unconverged
            # vs the true syndrome's 1% — it checks extrinsic-sign
            # parity, which lags the APP hard decisions by ~1 iteration.)
            unsat = None
            for layer in layers:
                par = syndrome_pass(v_ref, layer)
                unsat = par if unsat is None else jnp.maximum(unsat, par)
            ok_ref[...] = (unsat.max(axis=0)[None, :] == 0).astype(
                jnp.int32
            )
        # iters_used output is ONE (1, 1) SMEM cell accumulated across grid
        # steps (max over tiles) — per-tile (1, 1) blocks of an (ntiles, 1)
        # array fail the Mosaic block-mapping divisibility check
        @pl.when(pl.program_id(0) == 0)
        def _():
            iters_ref[0, 0] = cnt_ref[0]

        @pl.when(pl.program_id(0) != 0)
        def _():
            iters_ref[0, 0] = jnp.maximum(iters_ref[0, 0], cnt_ref[0])

    return kernel


def vmem_per_lane(code: LdpcCode, early_term: bool = False) -> int:
    """Estimated VMEM bytes per lane: int32 APP (4N) + int8 messages (M) +
    double-buffered int8 in/out tiles (4N) + int32 CN temporaries
    (~4 arrays x maxdeg x Z x 4B) + the ET bit snapshot (N int8); odd-Z
    codes are charged at their padded Zp layout."""
    maxdeg = max(l.deg for l in code.layers)
    et = code.N if early_term else 0
    z = code.Z or 64
    zp_f = (-(-z // 8) * 8) / z  # padded-Z inflation (1.0 for aligned Z)
    base = 4 * code.N + code.M + 4 * code.N + et
    return int(base * zp_f) + 16 * maxdeg * int(z * zp_f)


def pick_batch_tile(code: LdpcCode, vmem_budget: int = 100 << 20,
                    early_term: bool = False) -> int:
    """Lane tile whose working set fits VMEM (v5e-class chips have
    ~128 MB; the 16 MB figure often quoted is only the default scoped
    limit).  Capped at 256: measured throughput on v5e peaks there —
    larger tiles fit but run ~30% slower (bigger live sets scheduler
    worse), smaller ones under-utilize lanes.  ``early_term`` must match
    the kernel being built: the ET snapshot adds N int8 per lane, which
    flips the fit verdict on DVB-S2-scale codes (the first on-chip ET
    decode of 64800x32400 OOM'd scoped VMEM because the tile was picked
    against the non-ET footprint — round-5 spot-check find)."""
    per_lane = vmem_per_lane(code, early_term)
    tb = 256
    while tb > 128 and tb * per_lane > vmem_budget:
        tb //= 2
    return tb


def make_pallas_decoder(
    code: LdpcCode,
    spec: LayeredSpec = LayeredSpec(),
    batch_tile: int | None = None,
    interpret: bool = False,
    emit_mask: bool = False,
):
    """Build ``decode(llr[B, N] int8) -> (bits[B, N] uint8, iters_used)``.

    The batch is processed in lane tiles of ``batch_tile`` codewords; each
    grid step decodes its tile fully on-chip.  ``iters_used`` is
    ``spec.iters`` (per-lane early termination happens inside the kernel;
    the reference reports fixed-iteration counts the same way).

    ``emit_mask=True`` adds a third return, ``ok[B] bool``: the TRUE
    per-frame syndrome of the output hard decisions, computed IN-KERNEL
    by one cheap post-loop pass (~3 VPU ops/edge, ~1% of a 10-iter
    decode).  This is the phase-1 interface of the two-phase compaction
    ET (``decoder/twophase.py``) — it deletes that design's separate
    device syndrome stage (VERDICT r4 #6).  The reference's EARLY_TERM
    breaks on the on-the-fly extrinsic parity word instead
    (``CUDA_MS_SIMD.cu:242-245``); that criterion lags the hard
    decisions by ~1 iteration (measured: 33% vs 1% flagged unconverged
    at 576x288/3.0dB/k1=5), so routing on the true syndrome is both
    safe (only non-codeword frames re-decode) and strictly cheaper.
    """
    assert pallas_supported(code, spec), f"{code.name}: not all-QC layers"
    assert not (emit_mask and spec.early_term), (
        "emit_mask is the phase-1 interface of two-phase ET; combining it "
        "with in-kernel snapshot ET is unsupported"
    )
    Z = code.Z
    Zp = -(-Z // 8) * 8  # sublane-aligned layout (odd-Z emulated rolls)
    Nb = code.N // Z
    n_msg_slabs = sum(l.deg for l in code.layers)
    TB_max = (batch_tile if batch_tile is not None
              else pick_batch_tile(code, early_term=spec.early_term))
    kernels: dict[int, object] = {}

    def _tile_for(B: int) -> int:
        tb = min(TB_max, B)
        while B % tb:
            tb -= 128
        return tb

    def _call(llr3):  # [Nb, Zp, B], B a multiple of 128
        B = llr3.shape[-1]
        TB = _tile_for(B)
        if TB not in kernels:
            kernels[TB] = _build_kernel(code, spec, Z, TB,
                                        emit_mask=emit_mask)
        kernel = kernels[TB]
        out_specs = (
            pl.BlockSpec(
                (Nb, Zp, TB), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((Nb, Zp, B), _ST),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )
        if emit_mask:
            out_specs = out_specs + (
                pl.BlockSpec((1, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            )
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            )
        return pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec(
                    (Nb, Zp, TB), lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((Nb, Zp, TB), _CT),  # APP state (int32: rollable)
                pltpu.VMEM((n_msg_slabs, Zp, TB), _ST),  # c2v messages
                pltpu.VMEM((1, TB), jnp.int32),  # unsat lane mask
                pltpu.SMEM((1,), jnp.int32),  # this tile's iteration count
            ] + (
                # ET: int8 hard-decision snapshot, written at freeze time
                [pltpu.VMEM((Nb, Zp, TB), _ST)] if spec.early_term else []
            ),
            compiler_params=pltpu.CompilerParams(
                # 1.5x + flat headroom over the static estimate: scheduler
                # temporaries exceed the 1.25 margin
                vmem_limit_bytes=min(
                    int(vmem_per_lane(code, spec.early_term) * TB * 1.5)
                    + (4 << 20),
                    120 << 20,
                ),
            ),
            interpret=interpret,
        )(llr3)

    perm = inv_perm = None
    if code.col_perm is not None:
        perm = jnp.asarray(code.col_perm)
        ip = np.empty(code.N, dtype=np.int64)
        ip[code.col_perm] = np.arange(code.N)
        inv_perm = jnp.asarray(ip)

    @jax.jit
    def decode(llr):
        llr = jnp.asarray(llr, _ST)
        B0 = llr.shape[0]
        pad = (-B0) % 128  # lane-pad small/ragged batches
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, code.N), _ST)], axis=0
            )
        B = B0 + pad
        if perm is not None:
            llr = llr[:, perm]  # QC-ified view: to QC column order
        # interleave: frame-major [B, N] -> block-column-major [Nb, Z, B]
        llr3 = llr.T.reshape(Nb, Z, B)
        if Zp != Z:  # odd-Z: pad dummy rows (kernel keeps them isolated)
            llr3 = jnp.pad(llr3, ((0, 0), (0, Zp - Z), (0, 0)))
        res = _call(llr3)
        out3, tile_iters = res[0], res[1]
        if Zp != Z:
            out3 = out3[:, :Z, :]
        bits = out3.reshape(code.N, B).T.astype(jnp.uint8)
        if inv_perm is not None:
            bits = bits[:, inv_perm]
        if pad:
            bits = bits[:B0]
        iters_used = tile_iters.max().astype(jnp.int32)
        # actual iterations used = the slowest tile's count (ET kernels
        # count executed iterations; fixed-iteration kernels report iters)
        if emit_mask:
            ok = res[2][0, :B0] != 0  # [B] bool, lane padding sliced off
            return bits, iters_used, ok
        return bits, iters_used

    return decode
