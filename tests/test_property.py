"""Property-based fuzzing: random codes x random LLRs x random configs,
XLA decoder vs the native C++ oracle must agree bit for bit."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ldpcgputegra_tpu.codes.registry import make_qc_code, make_random_regular_code
from ldpcgputegra_tpu.golden import GoldenParams, decode_oracle
from ldpcgputegra_tpu.golden.native import native_available
from ldpcgputegra_tpu.ops.layered import LayeredSpec, make_layered_decoder

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native oracle not built"
)

_algos = st.sampled_from(["MS", "OMS", "NMS", "2NMS"])
_clamp = st.sampled_from(["pre", "post"])


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    algo=_algos,
    minclamp=_clamp,
    iters=st.integers(1, 6),
    offset=st.integers(0, 2),
)
def test_random_regular_code_agrees(seed, algo, minclamp, iters, offset):
    code = make_random_regular_code(128, 64, 4, seed=seed % 7)
    rng = np.random.default_rng(seed)
    llr = np.clip(
        8.0 * rng.normal(-1.0, 0.9, size=(2, code.N)), -31, 31
    ).astype(np.int8)
    spec = LayeredSpec(
        algo=algo, iters=iters, minclamp=minclamp, offset=offset,
        schedule="reference",
    )
    bits = np.asarray(make_layered_decoder(code, spec)(llr)[0])
    gp = GoldenParams(
        algo=algo, iters=iters, minclamp=minclamp, offset=offset
    )
    refs, _ = decode_oracle(code, llr, gp)
    np.testing.assert_array_equal(bits, refs)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    z=st.sampled_from([4, 8, 16]),
    sat_msg=st.sampled_from([15, 31]),
)
def test_random_qc_code_agrees(seed, z, sat_msg):
    rng = np.random.default_rng(seed)
    rows, cols = 3, 6
    base = rng.integers(-1, z, size=(rows, cols))
    # ensure every row has >= 2 entries (valid CN degree)
    for r in range(rows):
        while (base[r] >= 0).sum() < 2:
            base[r, rng.integers(cols)] = rng.integers(z)
    code = make_qc_code(f"fuzz{seed}", base, Z=z)
    llr = np.clip(
        8.0 * rng.normal(-1.0, 0.9, size=(2, code.N)), -31, 31
    ).astype(np.int8)
    spec = LayeredSpec(algo="OMS", iters=4, sat_msg=sat_msg)
    bits = np.asarray(make_layered_decoder(code, spec)(llr)[0])
    refs, _ = decode_oracle(
        code, llr, GoldenParams(algo="OMS", iters=4, sat_msg=sat_msg)
    )
    np.testing.assert_array_equal(bits, refs)
