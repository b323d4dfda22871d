"""Native C++ oracle must match the NumPy golden model bit for bit."""

import numpy as np
import pytest

from ldpcgputegra_tpu.codes.registry import load_code, make_random_regular_code
from ldpcgputegra_tpu.golden.decoder import (
    GoldenParams,
    decode_golden,
    syndrome_ok,
)
from ldpcgputegra_tpu.golden.native import (
    decode_golden_native,
    native_available,
    syndrome_ok_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native oracle not built"
)


def _llrs(n, b, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(
        8.0 * rng.normal(-1.0, 0.8, size=(b, n)), -31, 31
    ).astype(np.int8)


@pytest.mark.parametrize(
    "algo,minclamp,et",
    [
        ("MS", "post", False),
        ("OMS", "pre", False),
        ("OMS", "pre", True),
        ("NMS", "post", False),
        ("2NMS", "post", True),
    ],
)
def test_native_matches_numpy_golden(algo, minclamp, et):
    code = load_code("576x288")
    llr = _llrs(code.N, 4, seed=3)
    gp = GoldenParams(algo=algo, iters=6, minclamp=minclamp, early_term=et)
    bits_n, used_n = decode_golden_native(code, llr, gp)
    for b in range(4):
        ref, used = decode_golden(code, llr[b], gp)
        np.testing.assert_array_equal(bits_n[b], ref, err_msg=f"frame {b}")
        assert used_n[b] == used


def test_native_on_nonqc_code():
    code = make_random_regular_code(512, 256, 8, seed=3)
    llr = _llrs(code.N, 2, seed=5)
    gp = GoldenParams(algo="OMS", iters=4)
    bits_n, _ = decode_golden_native(code, llr, gp)
    for b in range(2):
        ref, _ = decode_golden(code, llr[b], gp)
        np.testing.assert_array_equal(bits_n[b], ref)


def test_native_syndrome():
    code = load_code("576x288")
    llr = _llrs(code.N, 8, seed=7)
    gp = GoldenParams(algo="OMS", iters=10)
    bits, _ = decode_golden_native(code, llr, gp)
    ok = syndrome_ok_native(code, bits)
    for b in range(8):
        assert ok[b] == syndrome_ok(code, bits[b])
    zero = np.zeros((1, code.N), np.int8)
    assert syndrome_ok_native(code, zero)[0]


def test_native_encode_matches_numpy():
    """Native accumulate encode must equal the NumPy path bit for bit."""
    import os

    from ldpcgputegra_tpu.channel.encoder import (
        QCAccumulateEncoder,
        StaircaseEncoder,
    )
    from ldpcgputegra_tpu.channel.bitgen import generate_info_bits

    os.environ["LDPC_TPU_NO_NATIVE"] = "0"
    code = load_code("16200x7560")
    enc = StaircaseEncoder(code)
    rng = np.random.default_rng(3)
    info = generate_info_bits(rng, 3, code.K)
    native = enc.encode(info)
    # force the numpy fallback by monkeypatching availability
    import ldpcgputegra_tpu.golden.native as gn

    orig = gn.native_available
    gn.native_available = lambda: False
    try:
        ref = enc.encode(info)
    finally:
        gn.native_available = orig
    np.testing.assert_array_equal(native, ref)
    for b in range(3):
        assert syndrome_ok(code, native[b])


def test_simd_decoder_bit_exact_all_algos():
    """AVX-512 SIMD decoder (64 frames/vector, per-lane ET freeze) vs the
    NumPy golden model: every algo, both minclamps, ET on/off, runtime
    NMS factor, a ragged (non-multiple-of-64) batch so padded lanes and
    the valid-mask path are exercised."""
    from ldpcgputegra_tpu.golden.native import (
        decode_simd_native,
        simd_available,
    )

    if not simd_available():
        pytest.skip("no AVX-512 build")
    rng = np.random.default_rng(11)
    for code in (
        make_random_regular_code(256, 128, 6, seed=3),
        load_code("576x288"),
    ):
        llr = np.clip(
            8.0 * rng.normal(-1.0, 0.9, size=(67, code.N)), -31, 31
        ).astype(np.int8)
        for algo, mc in (("OMS", "pre"), ("NMS", "post"),
                         ("2NMS", "post"), ("MS", "post")):
            for et in (False, True):
                gp = GoldenParams(algo=algo, iters=4, minclamp=mc,
                                  early_term=et, nms_factor=29 / 32.0)
                bits, used = decode_simd_native(code, llr, gp)
                ref = np.stack([
                    decode_golden(code, llr[b], gp)[0]
                    for b in range(llr.shape[0])
                ])
                np.testing.assert_array_equal(bits, ref,
                                              err_msg=f"{algo} et={et}")
                assert 1 <= used <= 4


def test_simd_decoder_narrow_quantizers():
    """sat_var/sat_msg below the int8 extremes (the -var/-msg flags)."""
    from ldpcgputegra_tpu.golden.native import (
        decode_simd_native,
        simd_available,
    )

    if not simd_available():
        pytest.skip("no AVX-512 build")
    code = make_random_regular_code(256, 128, 6, seed=4)
    rng = np.random.default_rng(12)
    llr = np.clip(
        8.0 * rng.normal(-1.0, 0.9, size=(64, code.N)), -31, 31
    ).astype(np.int8)
    gp = GoldenParams(algo="OMS", iters=5, minclamp="pre",
                      sat_var=63, sat_msg=15)
    bits, _ = decode_simd_native(code, llr, gp)
    ref = np.stack([
        decode_golden(code, llr[b], gp)[0] for b in range(llr.shape[0])
    ])
    np.testing.assert_array_equal(bits, ref)
