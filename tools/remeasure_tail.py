#!/usr/bin/env python3
"""Re-measure the 1944x972 waterfall tail (2.50/2.75 dB) at FE >= 100.

Round-1 measured BER 8.14e-08 @ 2.50 dB (25 FE) then 1.18e-07 @ 2.75 dB
(13 FE) — a non-monotonic inversion inside the points' ~±40% sampling
error (benchmarks/BER_NOTES.md).  This reruns both points with a 100-FE
target (~3e7 frames at 2.75 dB) to settle under-sampling vs error floor,
then merges them into benchmarks/ber_data/1944x972_OMS_10.json and
regenerates BER.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldpcgputegra_tpu.sim.sweep import SweepConfig, run_sweep  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

from run_ber_curves import DATA_DIR, write_md  # noqa: E402


def main() -> None:
    from ldpcgputegra_tpu.utils import (
        apply_platform_env,
        device_available,
    )

    apply_platform_env()

    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    enable_compile_cache()
    cfg = SweepConfig(
        code="1944x972",
        algo="OMS",
        iters=10,
        snr_min=2.5,
        snr_max=2.75,
        snr_step=0.25,
        batch=8192,
        max_fe=100,
        max_frames=40_000_000,
        timer_s=90.0,
        early_term=True,
    )
    res = run_sweep(cfg, progress=True)

    path = os.path.join(DATA_DIR, "1944x972_OMS_10.json")
    with open(path) as f:
        data = json.load(f)
    for p in res.points:
        rec = {
            "snr_db": p.snr_db,
            "ber": p.ber,
            "fer": p.fer,
            "frames": p.frames,
            "fe": p.fe,
            "be": p.be,
        }
        replaced = False
        for i, old in enumerate(data["points"]):
            if abs(old["snr_db"] - p.snr_db) < 1e-9:
                data["points"][i] = rec
                replaced = True
        if not replaced:
            data["points"].append(rec)
        print(f"(II) {p.snr_db} dB: BER {p.ber:.3e} on {p.fe} FE "
              f"/ {p.frames} frames", flush=True)
    data["points"].sort(key=lambda r: r["snr_db"])
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {write_md()}")


if __name__ == "__main__":
    main()
