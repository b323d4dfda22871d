"""Buffer dump/compare helpers (reference M5, ``tools/debug_fx.h:1-16``).

The reference's ``CheckMemoryDataSet``/``DumpFloatMemoryDataSet`` compare
device buffers against dumped files while bringing a kernel up; the JAX
equivalents compare any two (host or device) arrays and dump npz
snapshots, plus an LLR/APP pretty-printer for small frames.
"""

from __future__ import annotations

import numpy as np

__all__ = ["check_dataset", "dump_dataset", "load_dataset", "print_frame"]


def check_dataset(name: str, got, expect, max_report: int = 10) -> bool:
    """Elementwise compare; prints the first differing positions like the
    reference's CheckMemoryDataSet. Returns True when identical."""
    got = np.asarray(got)
    expect = np.asarray(expect)
    if got.shape != expect.shape:
        print(f"(EE) {name}: shape mismatch {got.shape} vs {expect.shape}")
        return False
    diff = np.nonzero(got.ravel() != expect.ravel())[0]
    if diff.size == 0:
        print(f"(II) {name}: OK ({got.size} values)")
        return True
    print(f"(EE) {name}: {diff.size}/{got.size} values differ")
    for i in diff[:max_report]:
        print(
            f"(EE)   [{i}] got={got.ravel()[i]} expect={expect.ravel()[i]}"
        )
    return False


def dump_dataset(path: str, **arrays) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_dataset(path: str) -> dict:
    return dict(np.load(path))


def print_frame(v, per_line: int = 16, limit: int = 128) -> None:
    v = np.asarray(v).ravel()[:limit]
    for i in range(0, v.size, per_line):
        row = " ".join(f"{int(x):4d}" for x in v[i : i + per_line])
        print(f"(DBG) {i:5d}: {row}")
