"""Streamed (HBM message pipeline) kernel under the Pallas interpreter.

Runs the full DMA slot discipline on CPU — bit-exactness here covers the
pipeline logic; real-TPU validation happens in the bench/verify flows.
"""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ldpcgputegra_tpu.codes.registry import make_qc_code
from ldpcgputegra_tpu.golden import GoldenParams, decode_oracle
from ldpcgputegra_tpu.kernels.pallas_streamed import make_streamed_decoder
from ldpcgputegra_tpu.ops.layered import LayeredSpec

_BASE = np.array(
    [
        [0, 2, -1, 5, 1, -1, 3, 0],
        [4, -1, 1, 0, -1, 2, 0, 6],
        [-1, 3, 0, -1, 6, 0, 2, 1],
    ]
)


def _toy():
    return make_qc_code("toy8", _BASE, Z=8)


def _llrs(n, b, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(
        8.0 * rng.normal(-1.0, 0.8, size=(b, n)), -31, 31
    ).astype(np.int8)


@pytest.mark.parametrize("algo,minclamp", [("OMS", "pre"), ("2NMS", "post")])
def test_streamed_interpret_bit_exact(algo, minclamp):
    code = _toy()
    spec = LayeredSpec(algo=algo, iters=3, minclamp=minclamp)
    dec = make_streamed_decoder(code, spec, batch_tile=128)
    llr = _llrs(code.N, 128, seed=3)
    with pltpu.force_tpu_interpret_mode():
        bits = np.asarray(dec(llr)[0])
    refs, _ = decode_oracle(
        code, llr, GoldenParams(algo=algo, iters=3, minclamp=minclamp)
    )
    np.testing.assert_array_equal(bits, refs)


def test_streamed_interpret_multi_tile():
    """Two in-kernel batch tiles exercise message-region reuse."""
    code = _toy()
    dec = make_streamed_decoder(
        code, LayeredSpec(algo="OMS", iters=2), batch_tile=128
    )
    llr = _llrs(code.N, 256, seed=9)
    with pltpu.force_tpu_interpret_mode():
        bits = np.asarray(dec(llr)[0])
    refs, _ = decode_oracle(code, llr, GoldenParams(algo="OMS", iters=2))
    np.testing.assert_array_equal(bits, refs)


def test_streamed_interpret_early_term():
    code = _toy()
    llr = _llrs(code.N, 128, seed=5)
    d_f = make_streamed_decoder(
        code, LayeredSpec(algo="OMS", iters=4), batch_tile=128
    )
    d_e = make_streamed_decoder(
        code,
        LayeredSpec(algo="OMS", iters=4, early_term=True),
        batch_tile=128,
    )
    with pltpu.force_tpu_interpret_mode():
        bf = np.asarray(d_f(llr)[0])
        be = np.asarray(d_e(llr)[0])
    np.testing.assert_array_equal(bf, be)
