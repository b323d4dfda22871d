"""Batch-sharded decode step over a device mesh.

One jitted function = channel-error counting + decode + convergence vote,
with the codeword batch laid out over the mesh ``dp`` axis via
``NamedSharding``.  XLA partitions the embarrassingly-parallel decode with
zero communication and inserts ICI all-reduces only for the scalar
(BE, FE) counters and the early-termination ``jnp.any`` vote — exactly the
communication structure SURVEY §5.8 prescribes as the replacement for the
reference's shared-memory ``CErrorAnalyzer::accumulate``
(``code/gpu_fixed/ber_analyzer/CErrorAnalyzer.cpp:87-92``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec, make_layered_decoder
from .mesh import BATCH_AXIS

__all__ = ["make_sharded_decoder"]


def make_sharded_decoder(
    code: LdpcCode,
    spec: LayeredSpec,
    mesh: Mesh,
    count_errors: bool = True,
):
    """Build ``step(llr[B,N], ref_bits?) -> (bits, iters_used, be, fe)``.

    ``llr`` is placed (or re-laid-out) as batch-sharded over ``dp``; the
    decoded bits come back with the same sharding, counters as replicated
    scalars.  ``ref_bits=None`` counts against the all-zero codeword.
    """
    inner = make_layered_decoder(code, spec)
    batch_sharding = NamedSharding(mesh, P(BATCH_AXIS, None))
    replicated = NamedSharding(mesh, P())

    def step(llr: jax.Array, ref_bits: Optional[jax.Array] = None):
        bits, iters_used = inner(llr)
        if not count_errors:
            return bits, iters_used
        ref = jnp.zeros_like(bits) if ref_bits is None else ref_bits
        err = (bits != ref).astype(jnp.int32)
        be_per_frame = err.sum(axis=1)
        be = be_per_frame.sum()
        fe = (be_per_frame != 0).astype(jnp.int32).sum()
        return bits, iters_used, be, fe

    jitted = jax.jit(
        step,
        in_shardings=(batch_sharding, batch_sharding),
        out_shardings=(
            (batch_sharding, replicated)
            if not count_errors
            else (batch_sharding, replicated, replicated, replicated)
        ),
    )

    def run(llr, ref_bits=None):
        llr = jax.device_put(llr, batch_sharding)
        if ref_bits is None:
            ref_bits = jnp.zeros(llr.shape, jnp.uint8)
        ref_bits = jax.device_put(ref_bits, batch_sharding)
        return jitted(llr, ref_bits)

    return run
