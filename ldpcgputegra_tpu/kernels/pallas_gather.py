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

__all__ = ["make_gather_decoder", "gather_supported", "gather_vmem_bytes"]

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
    n_slabs = (5 * deg + 8) if spec.early_term else (3 * deg + 8)
    slab = max_g * tb * 4 * n_slabs
    return 4 * code.N * tb + msg_rows * tb + 4 * code.N * tb + slab


def pick_sublanes(code: LdpcCode, spec: LayeredSpec,
                  budget: int = 100 << 20) -> int:
    """8 sublanes (full-VREG rows) when the working set fits, else 4
    (half-VREG loads, half the VMEM — lets 8000x4000/9972x4986 in)."""
    for sub in (8, 4):
        if gather_vmem_bytes(code, spec, sub) <= budget:
            return sub
    return 0


def _build_kernel(code: LdpcCode, spec: LayeredSpec, layers, bases, sub):
    sv, sm = spec.sat_var, spec.sat_msg
    Npad = code.N
    _SUB = sub

    def layer_pass(v_ref, m_ref, lay, base, active):
        idx = np.asarray(lay.idx)  # [G, deg] static
        G, deg = idx.shape
        # gather: one aligned VREG load per edge, staged to [G, 8, 128]
        slabs = [
            jnp.stack([v_ref[int(idx[c, j])] for c in range(G)])
            for j in range(deg)
        ]
        msgs = []
        contribs = []
        for j in range(deg):
            r0 = (base + j * G) * _SUB
            m = m_ref[pl.ds(r0, G * _SUB), :].reshape(G, _SUB, _LANE)
            m = m.astype(_CT)
            msgs.append(m)
            contribs.append(jnp.clip(slabs[j] - m, -sv, sv))
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
            if active is not None:
                v_new = jnp.where(active, v_new, slabs[j])
                m_new = jnp.where(active, m_new, msgs[j])
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
               cnt_ref):
        v_ref[...] = llr_ref[...].reshape(Npad, _SUB, _LANE).astype(_CT)
        m_ref[...] = jnp.zeros_like(m_ref)
        cnt_ref[0] = jnp.asarray(
            0 if spec.early_term else spec.iters, jnp.int32
        )
        if spec.early_term:
            unsat_ref[...] = jnp.ones_like(unsat_ref)

        def iteration(it, _):
            del it
            active = None
            if spec.early_term:
                active = unsat_ref[...] != 0  # [8, 128] codeword mask

            def run_layers():
                unsat = None
                for lay, base in zip(layers, bases):
                    parity = layer_pass(
                        v_ref, m_ref, lay, base,
                        active[None] if active is not None else None,
                    )
                    lay_un = parity.max(axis=0)  # [8, 128]
                    unsat = lay_un if unsat is None else jnp.maximum(
                        unsat, lay_un
                    )
                return unsat

            if spec.early_term:
                @pl.when(jnp.any(active))
                def _():
                    unsat = run_layers()
                    unsat_ref[...] = jnp.minimum(unsat_ref[...], unsat)
                    cnt_ref[0] = cnt_ref[0] + 1
            else:
                run_layers()
            return 0

        jax.lax.fori_loop(0, spec.iters, iteration, 0, unroll=False)
        out_ref[...] = (
            (v_ref[...] > 0).astype(_ST).reshape(Npad * _SUB, _LANE)
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
):
    """Build ``decode(llr[B, N] int8) -> (bits[B, N] uint8, iters_used)``.

    Batches are processed in tiles of 1024 codewords (8 sublanes x 128
    lanes); ragged batches are zero-padded.  Bit-exact to the golden model
    run in the same (colored) check order — see
    ``tests/test_pallas_gather.py``.
    """
    assert gather_supported(code, spec)
    assert code.col_perm is None, (
        f"{code.name}: gather kernel does not apply col_perm"
    )
    layers, bases, msg_rows = _plan(code, spec)
    sub = sublanes if sublanes is not None else pick_sublanes(code, spec)
    assert sub in (4, 8), f"{code.name}: no sublane tile fits VMEM"
    _SUB = sub
    _TB = _SUB * _LANE
    kernel = _build_kernel(code, spec, layers, bases, sub)
    N = code.N

    def _call(llr2):  # [N*8, 128*ntiles] int8
        ntiles = llr2.shape[1] // _LANE
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
            out_shape=(
                jax.ShapeDtypeStruct((N * _SUB, _LANE * ntiles), _ST),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((N, _SUB, _LANE), _CT),  # APP, 1 VREG per VN
                pltpu.VMEM((msg_rows * _SUB, _LANE), _ST),  # c2v messages
                pltpu.VMEM((_SUB, _LANE), jnp.int32),  # unsat codeword mask
                pltpu.SMEM((1,), jnp.int32),  # this tile's iteration count
            ],
            compiler_params=pltpu.CompilerParams(
                # the estimate now counts peak live temporaries itself, so
                # a 1.2x + flat margin suffices
                vmem_limit_bytes=min(
                    int(gather_vmem_bytes(code, spec, _SUB) * 1.2)
                    + (4 << 20),
                    120 << 20,
                ),
            ),
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
