"""Flooding-schedule min-sum decoding (XLA, any code).

The reference advertises a "Flooding scheduled decoder" banner
(``code/gpu_fixed/main.cpp:95``) but its flooding GPU decoder is commented
out (``main.cpp:20``); only degree-statistics data survives
(``code/x86/Constantes/64800x32400.dvb-s2/flooding.h``).  This module
provides the capability for real, and it is the natural fast path for
non-QC codes where the layered schedule degenerates into many small
gather layers: flooding needs ONE edge gather + rectangular per-class CN
reduction + one segment-sum per iteration, regardless of code structure.

Fixed-point semantics match the layered kernels' building blocks (int16
compute on int8 LLR, SAT_VAR/SAT_MSG clamps, same MS/OMS/NMS/2NMS f()),
but message passing is flooding: all checks read the *previous*
iteration's APP, and APP = channel LLR + sum of incoming messages.
Flooding converges ~2x slower per iteration than layered
(``paper/ldpcGpuTegra.tex:200``) — use ~2x the iteration count for the
same BER operating point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.code import LdpcCode
from .layered import LayeredSpec, _f_consts

__all__ = ["make_flooding_decoder", "flooding_golden"]

_CT = jnp.int16
_ST = jnp.int8


def _vn_segments(code: LdpcCode):
    """Edge->VN scatter data: edge order is check-major (reference order);
    returns the flat VN index per edge."""
    return jnp.asarray(code.edges, jnp.int32)


def make_flooding_decoder(code: LdpcCode, spec: LayeredSpec = LayeredSpec()):
    """Build ``decode(llr[B, N] int8) -> (bits, iters_used)`` (flooding)."""
    edge_vn = _vn_segments(code)  # [M]
    class_shapes = [(c.count, c.deg) for c in code.classes]
    class_offsets = np.cumsum(
        [0] + [cnt * deg for cnt, deg in class_shapes]
    ).tolist()
    sv, sm = spec.sat_var, spec.sat_msg

    def cn_update(contrib):  # [count, deg, B] int16 -> new msgs
        if spec.minclamp == "pre":
            a = jnp.abs(jnp.clip(contrib, -sm, sm))
        else:
            a = jnp.abs(contrib)
        sgn = (contrib > 0).astype(_CT)
        min1 = a.min(axis=1, keepdims=True)
        # second min: min over the rest = min of a with the min position
        # masked to +inf (ties: the second occurrence stays -> matches the
        # running two-min semantics of the reference kernels)
        ismin = a == min1
        first_min = jnp.cumsum(ismin.astype(_CT), axis=1) == ismin.astype(
            _CT
        )  # True only at the first minimal position
        only_first = ismin & first_min
        a_masked = jnp.where(only_first, sv + 1, a)
        min2 = a_masked.min(axis=1, keepdims=True)
        parity = (sgn.sum(axis=1, keepdims=True) & 1).astype(_CT)
        f1, f2 = _f_consts(min1, min2, spec)
        mag = jnp.where(only_first, f1, f2)
        m = jnp.where((parity ^ sgn) == 1, mag, -mag)
        if spec.minclamp == "pre":
            m = jnp.clip(m, -sm, sm)
        return m, parity

    def decode(llr: jax.Array):
        llr = jnp.asarray(llr, _ST)
        B = llr.shape[0]
        V0 = llr.T.astype(_CT)  # [N, B] channel LLRs (kept unclipped base)

        def iteration(carry):
            V, msgs, it, unsat = carry
            gathered = V[edge_vn]  # [M, B]
            new_msgs = []
            unsat_new = jnp.zeros((B,), jnp.bool_)
            m_off = 0
            for ci, (cnt, deg) in enumerate(class_shapes):
                sl = slice(class_offsets[ci], class_offsets[ci + 1])
                contrib = jnp.clip(
                    gathered[sl].reshape(cnt, deg, B)
                    - msgs[sl].reshape(cnt, deg, B).astype(_CT),
                    -sv,
                    sv,
                )
                m, parity = cn_update(contrib)
                new_msgs.append(m.reshape(cnt * deg, B))
                unsat_new = unsat_new | jnp.any(parity[:, 0, :] != 0, axis=0)
                m_off += cnt * deg
            m_all = jnp.concatenate(new_msgs, axis=0)  # [M, B] int16
            # VN update: APP = channel + sum of incoming messages
            acc = jax.ops.segment_sum(
                m_all, edge_vn, num_segments=code.N
            )
            V_new = jnp.clip(V0 + acc, -sv, sv)
            if spec.early_term:
                keep = unsat[None, :]
                V_new = jnp.where(keep, V_new, V)
                m_all = jnp.where(keep, m_all, msgs.astype(_CT))
            return V_new, m_all.astype(_ST), it + 1, unsat & unsat_new

        V = jnp.clip(V0, -sv, sv)
        msgs0 = jnp.zeros((code.M, B), _ST)
        unsat0 = jnp.ones((B,), jnp.bool_)
        if spec.early_term:
            def cond(c):
                _, _, it, unsat = c
                return jnp.any(unsat) & (it < spec.iters)

            V_fin, _, iters_used, _ = jax.lax.while_loop(
                cond, lambda c: iteration(c), (V, msgs0, 0, unsat0)
            )
        else:
            def body(c, _):
                return iteration(c), None

            (V_fin, _, iters_used, _), _ = jax.lax.scan(
                body, (V, msgs0, 0, unsat0), None, length=spec.iters
            )
        bits = (V_fin > 0).astype(jnp.uint8).T
        return bits, jnp.asarray(iters_used, jnp.int32)

    return jax.jit(decode)


def flooding_golden(code: LdpcCode, llr: np.ndarray, spec: LayeredSpec):
    """Scalar NumPy flooding oracle (specification for the XLA decoder)."""
    sv, sm = spec.sat_var, spec.sat_msg
    v0 = llr.astype(np.int64)
    msgs = np.zeros(code.M, np.int64)
    edges = code.edges
    v = np.clip(v0, -sv, sv)
    for _ in range(spec.iters):
        gathered = v[edges]
        new_msgs = np.empty_like(msgs)
        off = 0
        for c in code.classes:
            for chk in range(c.count):
                sl = slice(off, off + c.deg)
                contrib = np.clip(gathered[sl] - msgs[sl], -sv, sv)
                a = (
                    np.abs(np.clip(contrib, -sm, sm))
                    if spec.minclamp == "pre"
                    else np.abs(contrib)
                )
                sgn = (contrib > 0).astype(np.int64)
                order = np.argsort(a, kind="stable")
                min1, min2 = int(a[order[0]]), int(a[order[1]])
                parity = int(sgn.sum() & 1)
                from ..golden.decoder import GoldenParams, _f_consts as gf

                gp = GoldenParams(
                    algo=spec.algo, offset=spec.offset,
                    sat_var=sv, sat_msg=sm,
                )
                f1, f2 = gf(min1, min2, gp)
                for j in range(c.deg):
                    first_min = j == order[0]
                    mag = f1 if first_min else f2
                    s = parity ^ int(sgn[j])
                    m = mag if s == 1 else -mag
                    if spec.minclamp == "pre":
                        m = max(-sm, min(sm, m))
                    new_msgs[off + j] = m
                off += c.deg
        msgs = new_msgs
        acc = np.zeros(code.N, np.int64)
        np.add.at(acc, edges, msgs)
        v = np.clip(v0 + acc, -sv, sv)
    return (v > 0).astype(np.int8)
