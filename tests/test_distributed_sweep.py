"""DPxTP composed topology under the REAL sweep loop (VERDICT r2 #8):
a Monte-Carlo point for the giant DVB-S2 code runs through
``sim.distributed.run_dp_tp_point`` on a (2,4) virtual mesh with
counters bit-identical to a single-device decode of the same channel
batches, and the per-batch checkpoint resumes mid-point.
"""

import json
import os

import jax
import numpy as np
import pytest

from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec
from ldpcgputegra_tpu.codes.registry import load_code
from ldpcgputegra_tpu.decoder import make_decoder
from ldpcgputegra_tpu.ops.layered import LayeredSpec
from ldpcgputegra_tpu.sim.distributed import run_dp_tp_point

CODE = "64800x32400"
SNR = 1.0  # deep in the waterfall: every frame errs, counters are rich
BATCH = 8
BATCHES = 2
SPEC = LayeredSpec(algo="OMS", iters=2, early_term=False)


def _single_device_counts():
    """Reference counters: same keys, same channel, plain decoder."""
    code = load_code(CODE)
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(SNR)
    dec = make_decoder(code, SPEC)
    base = jax.random.key(1234)
    be = fe = 0
    for k in range(BATCHES):
        key = jax.random.fold_in(jax.random.fold_in(base, 0), k)
        llr = chan.generate_zero_int8(key, BATCH)
        bits, _ = dec(llr)
        err = np.asarray(bits) != 0
        be += int(err.sum())
        fe += int(err.any(axis=1).sum())
    return be, fe


@pytest.mark.slow
def test_dp_tp_sweep_point_matches_single_device(tmp_path):
    res = run_dp_tp_point(
        CODE, SNR, BATCH, BATCHES, SPEC, seed=1234, dp=2, tp=4,
        checkpoint=str(tmp_path / "ck.json"),
    )
    be, fe = _single_device_counts()
    assert res.frames == BATCH * BATCHES
    assert (res.bit_errors, res.frame_errors) == (be, fe)
    # the per-batch checkpoint recorded the full point
    st = json.load(open(tmp_path / "ck.json"))
    assert st["batches"] == BATCHES and st["be"] == be


@pytest.mark.slow
def test_dp_tp_sweep_point_resumes(tmp_path):
    ck = str(tmp_path / "ck.json")
    full = run_dp_tp_point(CODE, SNR, BATCH, BATCHES, SPEC, seed=1234,
                           dp=2, tp=4)
    # simulate a kill after batch 1: seed the checkpoint with batch 0+1
    # counters, then resume — the resumed point must equal the full run
    part = run_dp_tp_point(CODE, SNR, BATCH, 1, SPEC, seed=1234,
                           dp=2, tp=4, checkpoint=ck)
    del part
    res = run_dp_tp_point(CODE, SNR, BATCH, BATCHES, SPEC, seed=1234,
                          dp=2, tp=4, checkpoint=ck)
    assert (res.frames, res.bit_errors, res.frame_errors) == (
        full.frames, full.bit_errors, full.frame_errors
    )
    assert os.path.exists(ck)
