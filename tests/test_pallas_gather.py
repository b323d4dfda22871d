"""Non-QC Pallas gather kernel: bit-exact vs the golden model in the same
(colored) check order; early-term freeze; ragged-batch padding.

Runs in interpret mode on CPU (the kernel itself is TPU-targeted; Mosaic
compilation is exercised on hardware by the bench suite)."""

import numpy as np
import pytest

from ldpcgputegra_tpu.codes.code import DegreeClass, LdpcCode
from ldpcgputegra_tpu.codes.registry import make_random_regular_code
from ldpcgputegra_tpu.codes.schedule import build_layers
from ldpcgputegra_tpu.golden import GoldenParams, decode_oracle
from ldpcgputegra_tpu.kernels.pallas_gather import (
    gather_vmem_bytes,
    make_gather_decoder,
)
from ldpcgputegra_tpu.ops.layered import LayeredSpec


def _llrs(n, b, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(
        8.0 * rng.normal(-1.0, 0.8, size=(b, n)), -31, 31
    ).astype(np.int8)


def _colored_view(code, schedule="colored"):
    """A code whose reference order IS the schedule order (golden target)."""
    layers = build_layers(code, schedule)
    degs = sorted({l.deg for l in layers})
    assert len(degs) == 1, "test codes are regular"
    idx = np.concatenate([l.idx for l in layers], axis=0)
    return LdpcCode(
        name="perm", N=code.N, K=code.K,
        classes=(DegreeClass(degs[0], idx.shape[0]),), class_idx=(idx,),
    )


@pytest.mark.parametrize("algo,minclamp", [("OMS", "pre"), ("2NMS", "post")])
@pytest.mark.slow
def test_gather_kernel_bit_exact_colored(algo, minclamp):
    code = make_random_regular_code(512, 256, 8, seed=5)
    spec = LayeredSpec(algo=algo, iters=3, minclamp=minclamp,
                       schedule="colored")
    dec = make_gather_decoder(code, spec, interpret=True)
    llrs = _llrs(code.N, 3, seed=11)
    bits, it = dec(llrs)
    refs, _ = decode_oracle(
        _colored_view(code),
        llrs,
        GoldenParams(algo=algo, iters=3, minclamp=minclamp),
    )
    assert int(it) == 3
    np.testing.assert_array_equal(np.asarray(bits), refs)


@pytest.mark.slow
def test_gather_kernel_early_term_freeze():
    """ET output == fixed-iteration output (frozen updates), and noiseless
    input converges in one iteration."""
    code = make_random_regular_code(512, 256, 8, seed=5)
    s_fix = LayeredSpec(algo="OMS", iters=4, schedule="colored")
    s_et = LayeredSpec(algo="OMS", iters=4, schedule="colored",
                       early_term=True)
    llrs = _llrs(code.N, 2, seed=3)
    bits_f = np.asarray(make_gather_decoder(code, s_fix, interpret=True)(llrs)[0])
    d_et = make_gather_decoder(code, s_et, interpret=True)
    bits_e, used = d_et(llrs)
    np.testing.assert_array_equal(bits_f, np.asarray(bits_e))
    assert int(used) <= 4
    strong = np.full((2, code.N), -31, np.int8)
    _, used0 = d_et(strong)
    assert int(used0) == 1


@pytest.mark.slow
def test_gather_kernel_ragged_batch():
    """B not a multiple of the 1024-codeword tile: zero-padded, results for
    the real frames unchanged."""
    code = make_random_regular_code(256, 128, 6, seed=9)
    spec = LayeredSpec(algo="OMS", iters=2, schedule="colored")
    dec = make_gather_decoder(code, spec, interpret=True)
    llrs = _llrs(code.N, 5, seed=2)
    bits5 = np.asarray(dec(llrs)[0])
    refs, _ = decode_oracle(
        _colored_view(code), llrs, GoldenParams(algo="OMS", iters=2)
    )
    np.testing.assert_array_equal(bits5, refs)


def test_gather_vmem_estimate_4000x2000():
    """The paper's headline code must fit the auto-selection VMEM budget."""
    from ldpcgputegra_tpu.codes.registry import load_code

    code = load_code("4000x2000")
    spec = LayeredSpec(algo="OMS", iters=10, schedule="auto")
    assert gather_vmem_bytes(code, spec) <= (100 << 20)


@pytest.mark.slow
def test_gather_kernel_sublane4_bit_exact():
    """The half-VREG (sublanes=4) tile — used when 8 sublanes exceed VMEM
    (8000x4000, 9972x4986) — is bit-identical to the default tile."""
    code = make_random_regular_code(512, 256, 8, seed=5)
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored")
    llrs = _llrs(code.N, 3, seed=11)
    bits8 = np.asarray(
        make_gather_decoder(code, spec, interpret=True, sublanes=8)(llrs)[0]
    )
    bits4 = np.asarray(
        make_gather_decoder(code, spec, interpret=True, sublanes=4)(llrs)[0]
    )
    np.testing.assert_array_equal(bits8, bits4)
    refs, _ = decode_oracle(
        _colored_view(code), llrs, GoldenParams(algo="OMS", iters=3)
    )
    np.testing.assert_array_equal(bits4, refs)


@pytest.mark.slow
def test_gather_kernel_irregular_bit_exact():
    """Two degree classes (as in irregular references like 16200x7560's
    raw form): the colored schedule colors each class separately, so the
    kernel sees uniform-degree layers; output must equal the golden model
    decoding checks in the same (layer-concatenated) order."""
    a = make_random_regular_code(256, 128, 8, seed=21)
    b = make_random_regular_code(256, 192, 4, seed=22)
    code = LdpcCode(
        name="irr",
        N=256,
        K=128,
        classes=(DegreeClass(8, 128), DegreeClass(4, 64)),
        class_idx=(a.class_idx[0], b.class_idx[0]),
    )
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored")
    dec = make_gather_decoder(code, spec, interpret=True)
    llrs = _llrs(code.N, 3, seed=13)
    bits, it = dec(llrs)

    layers = build_layers(code, "colored")
    view = LdpcCode(
        name="irr-view",
        N=code.N,
        K=code.K,
        classes=tuple(DegreeClass(l.deg, l.idx.shape[0]) for l in layers),
        class_idx=tuple(l.idx for l in layers),
    )
    refs, _ = decode_oracle(view, llrs, GoldenParams(algo="OMS", iters=3))
    np.testing.assert_array_equal(np.asarray(bits), refs)


def test_gather_sublane_autoselect():
    """pick_sublanes: 8 when the full-VREG working set fits, 4 for the
    big non-QC codes, and backend_for routes them to pallas-gather."""
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.kernels.pallas_gather import pick_sublanes

    spec = LayeredSpec(algo="OMS", iters=10, schedule="auto")
    assert pick_sublanes(load_code("4000x2000"), spec) == 8
    assert pick_sublanes(load_code("8000x4000"), spec) == 4
    assert pick_sublanes(load_code("9972x4986"), spec) == 4


@pytest.mark.parametrize("sub", [8, 4])
@pytest.mark.parametrize("early_term", [False, True])
@pytest.mark.slow
def test_gather_chunked_matches_unrolled(sub, early_term):
    """The compile-size-bounded chunked kernel (fori_loop over SMEM-indexed
    check chunks) is bit-exact to the fully-unrolled kernel, with and
    without early termination, at both sublane widths.  G=96 is NOT a
    multiple of either chunk size (4 at sub=8, 8 at sub=4), so padded
    dummy-row checks are exercised."""
    code = make_random_regular_code(384, 192, 8, seed=31)
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored",
                       early_term=early_term)
    llrs = _llrs(code.N, 3, seed=17)
    d_un = make_gather_decoder(code, spec, interpret=True, sublanes=sub)
    d_ch = make_gather_decoder(code, spec, interpret=True, sublanes=sub,
                               chunked=True)
    bits_u, it_u = d_un(llrs)
    bits_c, it_c = d_ch(llrs)
    np.testing.assert_array_equal(np.asarray(bits_u), np.asarray(bits_c))
    assert int(it_u) == int(it_c)


@pytest.mark.slow
def test_gather_chunked_irregular_bit_exact():
    """Chunked kernel on a two-degree-class code vs the golden model in
    the colored order (mixed G and deg across layers stresses the
    per-layer chunk padding and message-base alignment)."""
    a = make_random_regular_code(256, 128, 8, seed=21)
    b = make_random_regular_code(256, 192, 4, seed=22)
    code = LdpcCode(
        name="irr",
        N=256,
        K=128,
        classes=(DegreeClass(8, 128), DegreeClass(4, 64)),
        class_idx=(a.class_idx[0], b.class_idx[0]),
    )
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored")
    dec = make_gather_decoder(code, spec, interpret=True, chunked=True)
    llrs = _llrs(code.N, 3, seed=13)
    bits, _ = dec(llrs)
    layers = build_layers(code, "colored")
    view = LdpcCode(
        name="irr-view",
        N=code.N,
        K=code.K,
        classes=tuple(DegreeClass(l.deg, l.idx.shape[0]) for l in layers),
        class_idx=tuple(l.idx for l in layers),
    )
    refs, _ = decode_oracle(view, llrs, GoldenParams(algo="OMS", iters=3))
    np.testing.assert_array_equal(np.asarray(bits), refs)


@pytest.mark.slow
def test_gather_chunked_sublane2_bit_exact():
    """Quarter-VREG chunked tile (sub=2, chunk=16): the configuration
    that lets 20000x10000 onto a fused path.  Bit-exact vs the unrolled
    kernel at sub=4 on the same code (different tilings, same math)."""
    code = make_random_regular_code(384, 192, 8, seed=31)
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored",
                       early_term=True)
    llrs = _llrs(code.N, 3, seed=19)
    bits_ref, it_ref = make_gather_decoder(
        code, spec, interpret=True, sublanes=4)(llrs)
    bits_c2, it_c2 = make_gather_decoder(
        code, spec, interpret=True, sublanes=2, chunked=True)(llrs)
    np.testing.assert_array_equal(np.asarray(bits_ref), np.asarray(bits_c2))
    assert int(it_ref) == int(it_c2)


def test_gather_chunked_rescues_20000():
    """pick_sublanes: no unrolled tile fits 20000x10000, but the chunked
    kernel does (full-width sub=8 via the streamed-messages io mode) —
    and backend_for routes there (simulated TPU check is covered by the
    fit functions; here we pin the fit logic)."""
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.kernels.pallas_gather import pick_sublanes

    spec = LayeredSpec(algo="OMS", iters=10, schedule="auto")
    code = load_code("20000x10000")
    assert pick_sublanes(code, spec) == 0
    assert pick_sublanes(code, spec, chunked=True) == 8


@pytest.mark.parametrize("early_term", [False, True])
@pytest.mark.slow
def test_gather_chunked_hbm_io_matches_windowed(early_term):
    """The hbm_io chunked variant (LLR/bit tiles DMA'd through one VMEM
    staging buffer instead of double-buffered pipeline windows — the
    20000x10000 configuration) is bit-exact to the windowed chunked
    kernel and the unrolled kernel, with and without early termination,
    across multiple batch tiles (the DMA slices walk the grid)."""
    code = make_random_regular_code(384, 192, 8, seed=31)
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored",
                       early_term=early_term)
    llrs = _llrs(code.N, 3, seed=23)
    bits_u, it_u = make_gather_decoder(
        code, spec, interpret=True, sublanes=4)(llrs)
    bits_h, it_h = make_gather_decoder(
        code, spec, interpret=True, sublanes=4, chunked=True,
        hbm_io=True)(llrs)
    np.testing.assert_array_equal(np.asarray(bits_u), np.asarray(bits_h))
    assert int(it_u) == int(it_h)


def test_pick_chunked_config_20000():
    """20000x10000: no windowed or staged chunked tile fits once the
    APP's sublane padding is charged honestly, but the full-width sub=8
    streamed-messages configuration does — with and without early
    termination (sub=8 measured 4.2x the throughput of the sub=2
    fallback on silicon; see pick_chunked_config's ordering note)."""
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.kernels.pallas_gather import pick_chunked_config

    code = load_code("20000x10000")
    spec = LayeredSpec(algo="OMS", iters=10, schedule="auto")
    assert pick_chunked_config(code, spec) == (8, "stream")
    spec_et = LayeredSpec(algo="OMS", iters=10, schedule="auto",
                          early_term=True)
    assert pick_chunked_config(code, spec_et) == (8, "stream")


@pytest.mark.slow
@pytest.mark.parametrize("early_term", [False, True])
def test_gather_chunked_stream_matches_unrolled(early_term):
    """The streamed-messages chunked variant (messages through an
    in/out-aliased HBM buffer with double-buffered group slots, peeled
    first iteration — the 20000x10000 configuration) is bit-exact to the
    unrolled kernel across multiple batch tiles (exercises the per-tile
    HBM message buffer reuse, which iteration 0's zero-message peel makes
    safe without a reset)."""
    code = make_random_regular_code(256, 128, 8, seed=31)
    spec = LayeredSpec(algo="OMS", iters=3, schedule="colored",
                       early_term=early_term)
    llrs = _llrs(code.N, 4, seed=29)
    bits_u, it_u = make_gather_decoder(
        code, spec, interpret=True, sublanes=4)(llrs)
    bits_s, it_s = make_gather_decoder(
        code, spec, interpret=True, sublanes=4, chunked=True,
        io_mode="stream")(llrs)
    np.testing.assert_array_equal(np.asarray(bits_u), np.asarray(bits_s))
    assert int(it_u) == int(it_s)


def test_pick_chunked_config_honors_caller_budget():
    """A caller-supplied budget is a hard cap for EVERY io mode — the
    round-4 code silently raised it to the io/stream defaults (ADVICE
    r4)."""
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.kernels.pallas_gather import (
        chunked_streamed_vmem_bytes,
        chunked_vmem_bytes,
        pick_chunked_config,
    )
    from ldpcgputegra_tpu.ops.layered import LayeredSpec

    code = load_code("20000x10000")
    spec = LayeredSpec(algo="OMS", iters=10, early_term=False)
    # default budget: the stream config fits (production answer)
    assert pick_chunked_config(code, spec) == (8, "stream")
    # a tight explicit budget must NOT be silently raised: nothing fits
    tight = 1 << 20
    assert chunked_vmem_bytes(code, spec, 2) > tight
    assert chunked_streamed_vmem_bytes(code, spec, 2) > tight
    assert pick_chunked_config(code, spec, budget=tight) == (0, "")
