#!/usr/bin/env python3
"""Derive the parity-check matrix implied by a DVB accumulate-encoder table
(codes/data/encoder_*.json) and register it as a loadable code.

The reference ships the N=16200, K=10800 encoder table (GenericEncoderTable.h)
but no matching H matrix — it could encode frames it could never decode.
The accumulator defines H exactly: check r contains every info VN x whose
table line scatters to r, plus the staircase pair (p_{r-1}, p_r).
"""
import json, numpy as np, sys
sys.path.insert(0, "/root/repo")
from ldpcgputegra_tpu.codes.code import LdpcCode
from ldpcgputegra_tpu.channel.encoder import QCAccumulateEncoder
from ldpcgputegra_tpu.golden.decoder import syndrome_ok

doc = json.load(open("/root/repo/ldpcgputegra_tpu/codes/data/encoder_16200x10800.json"))
N, K, Q, M360 = doc["N"], doc["K"], doc["Q"], doc["M"]
NmK = N - K
rows_info = [[] for _ in range(NmK)]
for g, line in enumerate(doc["rows"]):
    p = np.asarray(line, dtype=np.int64)
    for t in range(M360):
        x = g * M360 + t
        for r in (p + (t % M360) * Q) % NmK:
            rows_info[int(r)].append(x)
# checks: row r = info VNs + parity p_r (+ p_{r-1})
checks = []
for r in range(NmK):
    vns = sorted(set(rows_info[r])) + ([K + r - 1] if r > 0 else []) + [K + r]
    checks.append(np.asarray(sorted(vns), dtype=np.int32))
# degree-class grouping (descending degree, stable order)
from collections import defaultdict
by_deg = defaultdict(list)
for c in checks:
    by_deg[len(c)].append(c)
classes = []
edges = []
for deg in sorted(by_deg, reverse=True):
    blk = np.stack(by_deg[deg])
    classes.append((deg, blk.shape[0]))
    edges.append(blk.ravel())
edges = np.concatenate(edges)
code = LdpcCode.from_edges("16200x10800", N, None, classes, edges, detect_qc=False)
print("N", code.N, "K", code.K, "M", code.M, "checks", code.n_checks, "classes", [(c.deg,c.count) for c in code.classes])
assert code.K == K
# validate: encoder output satisfies the derived H
enc = QCAccumulateEncoder(N, K, Q, M360, doc["rows"])
rng = np.random.default_rng(1)
info = rng.integers(0, 2, size=(4, K)).astype(np.int8)
coded = enc.encode(info)
ok = all(syndrome_ok(code, coded[b]) for b in range(4))
print("encoder/H consistency:", ok)
assert ok
np.savez_compressed("/root/repo/ldpcgputegra_tpu/codes/data/16200x10800.npz",
    N=N, K=np.int64(code.n_checks),  # stored K follows the registry's check-count convention
    Z=0, classes=np.asarray([(c.deg, c.count) for c in code.classes]), edges=code.edges)
print("saved 16200x10800.npz")
