"""Pipelined decode stream — the library-surface form of the reference's
``decode_stream`` (``CGPUDecoder.h:20-37``, per-stream overlap in
``code/gpu_fixed/test.cpp:345-420``).

JAX dispatch is asynchronous, so a "stream" is simply a bounded window of
in-flight batches: ``submit`` enqueues a decode immediately and returns;
results come back in order from ``get``/iteration, each materialized only
when requested.  ``depth`` bounds device-queue memory (like the
reference's W streams bound pinned-buffer count).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, Optional

import numpy as np

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec
from . import make_decoder

__all__ = ["DecodeStream"]

class DecodeStream:
    def __init__(
        self,
        code: LdpcCode,
        spec: LayeredSpec = LayeredSpec(),
        backend: str = "auto",
        depth: int = 4,
    ):
        self._decode = make_decoder(code, spec, backend=backend)
        self.depth = max(1, depth)
        self._inflight: deque = deque()
        self._ready_cache: list = []

    def submit(self, llr) -> None:
        """Enqueue a batch; blocks (materializing the oldest result into
        the ready queue) only when the window is full."""
        if len(self._inflight) >= self.depth:
            # force the oldest to complete to bound device memory
            self._materialize_oldest()
        self._inflight.append(self._decode(llr))

    def _materialize_oldest(self):
        bits, iters = self._inflight.popleft()
        self._ready_cache.append((np.asarray(bits), int(iters)))

    def get(self) -> Optional[tuple[np.ndarray, int]]:
        """Next result in submission order (None if nothing pending)."""
        if self._ready_cache:
            return self._ready_cache.pop(0)
        if self._inflight:
            bits, iters = self._inflight.popleft()
            return np.asarray(bits), int(iters)
        return None

    def drain(self) -> Iterator[tuple[np.ndarray, int]]:
        """Yield all remaining results in order."""
        while True:
            r = self.get()
            if r is None:
                return
            yield r

    @property
    def pending(self) -> int:
        return len(self._inflight) + len(self._ready_cache)
