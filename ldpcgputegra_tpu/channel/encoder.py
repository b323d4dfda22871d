"""Encoders (reference components C5/C6 equivalents, and beyond).

The reference ships two encoders (``code/x86/CEncoder/EncoderLibrary.h:27-34``):

* ``CFakeEncoder`` — all-zero codeword (``CFakeEncoder.cpp:17-30``);
* ``GenericEncoder`` — DVB-S2-style QC accumulator: for each info bit,
  XOR into parity positions ``(p + (x % 360) * Q) % NmK`` from a table,
  then a running XOR over parities (``GenericEncoder.cpp:38-78``) — but only
  one hard-coded table.

This framework generalises: the accumulate encoder is table-driven at
runtime; a *structure-derived* staircase encoder reconstructs the same
accumulator form directly from any H with dual-diagonal parity (all DVB-S2
codes); and a generic GF(2) encoder handles arbitrary codes by one-time
parity-matrix elimination.  Encoding itself is a batched XOR/matmul —
host-side NumPy here (it is host-side scalar C++ in the reference too); the
hot path (channel+decode) stays on device.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..codes.code import LdpcCode

__all__ = [
    "Encoder",
    "FakeEncoder",
    "QCAccumulateEncoder",
    "StaircaseEncoder",
    "GF2Encoder",
    "make_encoder",
]


class Encoder:
    """Batched encoder interface: info bits [B, K] -> codeword bits [B, N]."""

    n: int
    k: int

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class FakeEncoder(Encoder):
    """All-zero codeword (CFakeEncoder): ignores info bits."""

    def __init__(self, n: int, k: int):
        self.n, self.k = n, k

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        b = info_bits.shape[0]
        return np.zeros((b, self.n), dtype=np.int8)


class QCAccumulateEncoder(Encoder):
    """DVB-S2-style QC accumulator from a runtime table.

    Table semantics follow ``GenericEncoder::encode``: info bits are walked
    in groups of ``m`` (=360); group ``g`` uses table line ``g`` whose
    positions scatter as ``(pos + (x % m) * q) % (n - k)``; a final running
    XOR turns accumulated parities into the staircase parity chain.
    """

    def __init__(self, n: int, k: int, q: int, m: int, lines: list[list[int]]):
        self.n, self.k, self.q, self.m = n, k, q, m
        self.lines = [np.asarray(l, dtype=np.int64) for l in lines]
        assert len(self.lines) * m == k, "table does not cover K info bits"
        # Precompute, per info bit x, its scatter positions (ragged -> flat
        # CSR-ish arrays) so encode is pure vectorized XOR-accumulate.
        pos_list = []
        bit_list = []
        nmk = n - k
        for g, line in enumerate(self.lines):
            for x_in_g in range(m):
                x = g * m + x_in_g
                p = (line + (x % m) * q) % nmk
                pos_list.append(p)
                bit_list.append(np.full(p.size, x, dtype=np.int64))
        self._scatter_pos = np.concatenate(pos_list)
        self._scatter_bit = np.concatenate(bit_list)

    @staticmethod
    def from_json(path: str) -> "QCAccumulateEncoder":
        doc = json.load(open(path))
        return QCAccumulateEncoder(
            doc["N"], doc["K"], doc["Q"], doc["M"], doc["rows"]
        )

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        b = info_bits.shape[0]
        assert info_bits.shape == (b, self.k)
        u = info_bits.astype(np.int8)
        from ..golden.native import encode_accumulate_native, native_available

        if native_available():
            return encode_accumulate_native(
                self._scatter_pos, self._scatter_bit, u, self.n, self.k
            )
        nmk = self.n - self.k
        # accumulate: par[pos] ^= u[bit] for each scatter pair
        contrib = u[:, self._scatter_bit].astype(np.int64)
        par = np.zeros((b, nmk), dtype=np.int64)
        np.add.at(par, (slice(None), self._scatter_pos), contrib)
        par &= 1
        # running XOR (staircase chain): p_i ^= p_{i-1}
        par = np.bitwise_xor.accumulate(par, axis=1)
        out = np.empty((b, self.n), dtype=np.int8)
        out[:, : self.k] = u
        out[:, self.k :] = par.astype(np.int8)
        return out


def _check_rows_in_parity_order(code: LdpcCode) -> Optional[np.ndarray]:
    """Recover original staircase row order from parity-column membership.

    In a dual-diagonal (staircase) code, original check row ``i`` contains
    parity VNs {K+i-1, K+i} (row 0: just {K}).  Degree-class sorting loses
    row order; this maps each check back, returning for each original row
    the index arrays of its *info* VNs, or None if the code isn't staircase.
    """
    K, M = code.K, code.n_checks
    rows_info: list[Optional[np.ndarray]] = [None] * M
    for ci in code.class_idx:
        for c in range(ci.shape[0]):
            vns = ci[c]
            par = np.sort(vns[vns >= K]) - K
            info = vns[vns < K]
            if par.size == 1 and par[0] == 0:
                row = 0
            elif par.size == 2 and par[1] == par[0] + 1:
                row = int(par[1])
            else:
                return None
            if rows_info[row] is not None:
                return None
            rows_info[row] = info
    if any(r is None for r in rows_info):
        return None
    return rows_info  # type: ignore[return-value]


class StaircaseEncoder(Encoder):
    """Encoder derived from H itself for dual-diagonal parity codes.

    Works for every DVB-S2-family matrix in the registry without needing
    the reference's hard-coded EncValues table: parity ``p_i`` satisfies
    ``p_i = p_{i-1} ^ XOR(info VNs of row i)``, i.e. a cumulative XOR of
    per-row info sums — exactly what ``GenericEncoder``'s final running XOR
    computes (``GenericEncoder.cpp:74-77``).
    """

    def __init__(self, code: LdpcCode):
        rows_info = _check_rows_in_parity_order(code)
        if rows_info is None:
            raise ValueError(f"{code.name}: parity part is not staircase")
        self.n, self.k = code.N, code.K
        lens = np.asarray([r.size for r in rows_info])
        self._row_ptr = np.concatenate([[0], np.cumsum(lens)])
        self._row_idx = (
            np.concatenate(rows_info)
            if self._row_ptr[-1]
            else np.empty(0, np.int64)
        )
        self._row_of_edge = np.repeat(np.arange(len(rows_info)), lens)

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        b = info_bits.shape[0]
        from ..golden.native import encode_accumulate_native, native_available

        if native_available():
            return encode_accumulate_native(
                self._row_of_edge, self._row_idx,
                info_bits.astype(np.int8), self.n, self.k,
            )
        u = info_bits.astype(np.int64)
        m = self.n - self.k
        s = np.zeros((b, m), dtype=np.int64)
        np.add.at(s, (slice(None), self._row_of_edge), u[:, self._row_idx])
        s &= 1
        par = np.bitwise_xor.accumulate(s, axis=1)
        out = np.empty((b, self.n), dtype=np.int8)
        out[:, : self.k] = u.astype(np.int8)
        out[:, self.k :] = par.astype(np.int8)
        return out


class GF2Encoder(Encoder):
    """Generic encoder by one-time GF(2) Gauss-Jordan with column pivoting.

    Reduces H so that a chosen set of M pivot columns forms the identity;
    the remaining K columns carry the info bits and the pivots solve as
    ``c_pivot = S @ c_info``.  Pivots prefer high column indices, so for
    codes whose last-M block is invertible the mapping is the classic
    systematic [info | parity] split; otherwise info bits land at the
    computed ``info_cols`` (still a valid systematic encoding — decoded
    codewords are compared bit-for-bit over all N either way).  Intended
    for small/medium codes (M up to a few thousand); staircase codes
    should use `StaircaseEncoder`.
    """

    def __init__(self, code: LdpcCode, max_m: int = 4096):
        M, N, K = code.n_checks, code.N, code.K
        if M > max_m:
            raise ValueError(
                f"{code.name}: M={M} too large for dense GF2 elimination"
            )
        H = np.zeros((M, N), dtype=bool)
        c0 = 0
        for ci in code.class_idx:
            for c in range(ci.shape[0]):
                H[c0 + c, ci[c]] = True
            c0 += ci.shape[0]
        pivot_of_row: list[int] = []
        pivot_rows: list[int] = []
        is_pivot = np.zeros(N, dtype=bool)
        for r in range(M):
            cand = np.nonzero(H[r] & ~is_pivot)[0]
            if cand.size == 0:
                # linearly dependent check (rank-deficient H — e.g. the
                # 10GBASE-T-like 2048x384 matrix): automatically satisfied,
                # nothing to solve for
                assert not H[r].any(), "inconsistent elimination state"
                continue
            p = int(cand[-1])  # prefer high indices (systematic when possible)
            is_pivot[p] = True
            pivot_of_row.append(p)
            pivot_rows.append(r)
            rows = H[:, p].copy()
            rows[r] = False
            H[rows] ^= H[r]
        self.n, self.k = N, K
        free_cols = np.nonzero(~is_pivot)[0]
        # rank deficiency leaves more than K free columns; carry info bits
        # in the first K and pin the surplus to zero (still systematic)
        self.info_cols = free_cols[:K]
        self.zero_cols = free_cols[K:]
        self.pivot_cols = np.asarray(pivot_of_row)
        # c_pivot = S @ c_info (surplus free columns contribute nothing
        # since they are pinned to zero)
        self._S = H[np.asarray(pivot_rows)][:, self.info_cols]

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        b = info_bits.shape[0]
        u = info_bits.astype(np.uint8)
        piv = (u @ self._S.T.astype(np.uint8)) & 1
        out = np.zeros((b, self.n), dtype=np.int8)
        out[:, self.info_cols] = u.astype(np.int8)
        out[:, self.pivot_cols] = piv.astype(np.int8)
        return out  # zero_cols stay 0


def make_encoder(code: LdpcCode, kind: str = "auto") -> Encoder:
    """Factory (EncoderLibrary equivalent): fake | table | staircase | gf2 | auto.

    ``auto`` picks: registry accumulate table if present, else staircase if
    H is dual-diagonal, else dense GF(2), else fake (with a warning path
    left to the caller).
    """
    if kind == "fake":
        return FakeEncoder(code.N, code.K)
    data_dir = os.path.join(os.path.dirname(__file__), "..", "codes", "data")
    table = os.path.join(data_dir, f"encoder_{code.N}x{code.K}.json")
    if kind == "table" or (kind == "auto" and os.path.exists(table)):
        return QCAccumulateEncoder.from_json(table)
    if kind in ("staircase", "auto"):
        try:
            return StaircaseEncoder(code)
        except ValueError:
            if kind == "staircase":
                raise
    if kind in ("gf2", "auto"):
        try:
            return GF2Encoder(code)
        except ValueError:
            if kind == "gf2":
                raise
    if kind == "auto":
        return FakeEncoder(code.N, code.K)
    raise ValueError(f"unknown encoder kind {kind!r}")
