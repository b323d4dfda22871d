"""Bench harness and roofline accounting tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcgputegra_tpu.bench import measure_call, throughput_report
from ldpcgputegra_tpu.bench.roofline import hw_spec, kernel_model, roofline_report
from ldpcgputegra_tpu.codes.registry import load_code
from ldpcgputegra_tpu.ops.layered import LayeredSpec


def test_measure_call_slope_positive():
    @jax.jit
    def f(x):
        return (x.astype(jnp.int32) ** 2).cumsum(axis=1).astype(jnp.int32)

    inputs = [jnp.ones((64, 512), jnp.int8) * i for i in range(4)]
    sec = measure_call(f, inputs, k_small=2, k_large=8, repeats=2)
    assert sec > 0


def test_throughput_report_accounting():
    rep = throughput_report(0.01, frames=1000, n=2000)
    # Mbps = frames * N / t / 1e6 (main.cpp:311-315)
    assert rep["coded_mbps"] == pytest.approx(1000 * 2000 / 0.01 / 1e6)
    assert rep["ms_per_call"] == pytest.approx(10.0)
    assert rep["frames_per_s"] == pytest.approx(1e5)


def test_roofline_model_scales_with_iters_and_batch():
    code = load_code("576x288")
    m1 = kernel_model(code, LayeredSpec(iters=10), batch=1024)
    m2 = kernel_model(code, LayeredSpec(iters=20), batch=1024)
    m3 = kernel_model(code, LayeredSpec(iters=10), batch=2048)
    assert m2["vpu_ops"] == 2 * m1["vpu_ops"]
    assert m3["vpu_ops"] == 2 * m1["vpu_ops"]
    # streamed variant adds message HBM traffic
    ms = kernel_model(code, LayeredSpec(iters=10), batch=1024, streamed=True)
    assert ms["hbm_bytes"] > m1["hbm_bytes"]


def test_roofline_report_bounds():
    code = load_code("576x288")
    spec = LayeredSpec(iters=10)
    hw = hw_spec()
    m = kernel_model(code, spec, batch=1024)
    t_bound = m["vpu_ops"] / hw.vpu_elem_ops
    r = roofline_report(code, spec, 1024, seconds=t_bound)
    assert r["roofline_frac"] == pytest.approx(1.0)
    assert r["bound"] in ("vpu", "hbm")


def test_bench_latency_row_cpu():
    """bench_latency measures the minimum 128-lane tile and reports the
    reference's latency fields (main.cpp/ARM (PERF) analogue)."""
    from ldpcgputegra_tpu.bench.suite import bench_latency

    r = bench_latency("576x288", iters=2, quick=True)
    assert r["batch"] == 128
    assert r["ms_per_call"] > 0
    assert r["us_per_frame"] == pytest.approx(
        r["ms_per_call"] * 1e3 / 128, rel=0.01
    )
    assert r["coded_mbps"] > 0
