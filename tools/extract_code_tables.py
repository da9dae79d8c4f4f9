"""Recover standard LDPC code tables from the reference ALIST assets.

The reference ships 38 ALIST parity-check matrices
(`/root/reference/optic/comm/ALIST/`, consumed by fec.py:197). Every one of
them encodes a *published standard* code whose defining data is a compact
table, not a 1M-line edge list:

- DVB-S2 (ETSI EN 302 307-1, Annex B/C): accumulator address tables — one
  row of check addresses per 360-bit group of information bits; bit
  ``i = 360 g + t`` connects to checks ``(x + t q) mod M`` for each table
  entry ``x`` of row ``g`` (q = M/360), plus the staircase parity part.
- IEEE 802.11n (IEEE 802.11-2012, Annex F): a (mb, 24) base matrix of
  circulant shifts (−1 = zero block), lifting factor Z = n/24.
- AR4JA (CCSDS 131.0-B-2, §7.4): a small base matrix of M×M blocks, each a
  GF(2) sum of "quarter-block" permutations
  ``pi(i) = (M/4) tq[j] + (off[j] + i) mod (M/4)`` with ``j = floor(4 i / M)``
  (the standard's theta_k / phi_k(j, M) parameterization).

This script inverts each ALIST back to those tables, verifies that the
reconstruction reproduces the ALIST support EXACTLY, and writes
``opticommpy_tpu/comm/_code_tables.py``. The emitted numbers are the
standards' own tables (public data), not the reference's expression of them;
the constructors that consume them live in ``opticommpy_tpu/comm/codes.py``.

Run (requires the reference mount):
    python tools/extract_code_tables.py
"""

import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from opticommpy_tpu.comm.fec import read_alist_edges  # noqa: E402

ALIST_DIR = "/root/reference/optic/comm/ALIST"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "opticommpy_tpu", "comm", "_code_tables.py")


def edge_set(rows, cols):
    return set(zip(map(int, rows), map(int, cols)))


# ---------------------------------------------------------------- DVB-S2


def extract_dvbs2(path):
    n, m, rows, cols = read_alist_edges(path)
    k = n - m
    q, r = divmod(m, 360)
    assert r == 0, path
    colmap = defaultdict(list)
    for rr, cc in zip(rows, cols):
        colmap[int(cc)].append(int(rr))
    # staircase parity part
    for j in range(m):
        want = [j, j + 1] if j < m - 1 else [m - 1]
        assert sorted(colmap[k + j]) == want, (path, j)
    table = [sorted(colmap[360 * g]) for g in range(k // 360)]
    # verify every interleaved column, not just t=0
    for g, row in enumerate(table):
        for t in range(1, 360):
            want = sorted((x + t * q) % m for x in row)
            assert sorted(colmap[360 * g + t]) == want, (path, g, t)
    return {"n": n, "k": k, "table": table}


# ------------------------------------------------------------- IEEE 802.11n


def extract_ieee80211(path):
    n, m, rows, cols = read_alist_edges(path)
    Z = n // 24
    assert 24 * Z == n and m % Z == 0, path
    mb = m // Z
    shifts = -np.ones((mb, 24), dtype=int)
    first = {}
    for rr, cc in zip(rows, cols):
        rb, ri = divmod(int(rr), Z)
        cb = int(cc) // Z
        if ri == 0:
            first[(rb, cb)] = int(cc) % Z
    for (rb, cb), sh in first.items():
        shifts[rb, cb] = sh
    # verify exact reconstruction
    want = set()
    for rb in range(mb):
        for cb in range(24):
            sh = shifts[rb, cb]
            if sh < 0:
                continue
            for i in range(Z):
                want.add((rb * Z + i, cb * Z + (i + sh) % Z))
    assert want == edge_set(rows, cols), path
    return {"n": n, "k": n - m, "shifts": shifts.tolist()}


# ------------------------------------------------------------------ AR4JA


def extract_ar4ja(path):
    """Decompose each M x M block into quarter-block permutations."""
    n, m, rows, cols = read_alist_edges(path)
    M = m // 3  # AR4JA always has 3 block-rows
    assert 3 * M == m and n % M == 0, path
    nb = n // M
    Q = M // 4
    # per block, per source quarter: multiset of (target quarter, offset)
    blocks = defaultdict(lambda: defaultdict(set))
    counts = defaultdict(lambda: defaultdict(int))
    for rr, cc in zip(rows, cols):
        rb, i = divmod(int(rr), M)
        cb, ci = divmod(int(cc), M)
        j, cq = divmod(i, Q)  # source quarter of row i
        tq, coff = divmod(ci, Q)
        off = (coff - i) % Q
        blocks[(rb, cb)][j].add((tq, off))
        counts[(rb, cb)][j] += 1
    out_blocks = {}
    for key, quarters in blocks.items():
        if not quarters:
            continue
        # each permutation contributes exactly one (tq, off) per quarter j
        w = {j: len(v) for j, v in quarters.items()}
        nperm = w[0]
        assert all(v == nperm for v in w.values()), (path, key, w)
        assert all(counts[key][j] == nperm * Q for j in range(4)), (path, key)
        perms = []  # each: [(tq, off) for j in 0..3]
        qlists = {j: sorted(quarters[j]) for j in range(4)}
        for p in range(nperm):
            perms.append([qlists[j][p] for j in range(4)])
        # Pairing of (tq, off) across source quarters into "permutations" is
        # arbitrary: H only depends on the per-quarter multiset, so any
        # pairing reconstructs the same block.
        out_blocks[key] = perms
    # verify exact reconstruction
    want = set()
    for (rb, cb), perms in out_blocks.items():
        for p in perms:
            for i in range(M):
                j = i // Q
                tq, off = p[j]
                want.add((rb * M + i, cb * M + tq * Q + (off + i) % Q))
    got = edge_set(rows, cols)
    assert want == got, (path, len(want - got), len(got - want))
    return {
        "n": n, "m": m, "M": M, "nb": nb,
        "blocks": {f"{rb},{cb}": perms
                   for (rb, cb), perms in sorted(out_blocks.items())},
    }


# ------------------------------------------------------------------- main


def main():
    dvbs2, ieee, ar4ja = {}, {}, {}
    for fn in sorted(os.listdir(ALIST_DIR)):
        path = os.path.join(ALIST_DIR, fn)
        mt = re.match(r"LDPC_DVBS2_(\d+)b_R(\d+)\.txt", fn)
        if mt:
            nbits, rtag = mt.groups()
            dvbs2[f"{nbits}_{rtag}"] = extract_dvbs2(path)
            print("dvbs2", fn, "ok")
            continue
        mt = re.match(r"LDPC_IEEE_802\.11nD2_(\d+)b_R(\d+)\.txt", fn)
        if mt:
            nbits, rtag = mt.groups()
            ieee[f"{nbits}_{rtag}"] = extract_ieee80211(path)
            print("ieee", fn, "ok")
            continue
        mt = re.match(r"LDPC_AR4JA_(\d+)b_R(\d+)\.txt", fn)
        if mt:
            nbits, rtag = mt.groups()
            ar4ja[f"{nbits}_{rtag}"] = extract_ar4ja(path)
            print("ar4ja", fn, "ok")
            continue
        print("skip", fn)

    with open(OUT, "w") as f:
        f.write('"""Standard LDPC code tables (generated — do not edit).\n\n'
                "Data recovered by tools/extract_code_tables.py; the numbers\n"
                "are the standards' own defining tables:\n"
                "- DVBS2: ETSI EN 302 307-1 Annex B/C accumulator address\n"
                "  tables (one row per 360-bit group; q = (n-k)/360).\n"
                "- IEEE80211: IEEE 802.11-2012 Annex F circulant-shift base\n"
                "  matrices (-1 = zero block, Z = n/24).\n"
                "- AR4JA: CCSDS 131.0-B-2 quarter-block permutation\n"
                "  parameters per base-matrix block: perm = [(tq, off) x4],\n"
                "  pi(i) = (M/4)*tq[j] + (off[j] + i) mod (M/4),\n"
                "  j = i // (M/4).\n"
                '"""\n\n')
        f.write("DVBS2 = ")
        f.write(repr(dvbs2))
        f.write("\n\nIEEE80211 = ")
        f.write(repr(ieee))
        f.write("\n\nAR4JA = ")
        f.write(repr(ar4ja))
        f.write("\n")
    sz = os.path.getsize(OUT)
    print(f"wrote {OUT} ({sz/1024:.0f} KiB) — "
          f"{len(dvbs2)} DVB-S2, {len(ieee)} 802.11n, {len(ar4ja)} AR4JA")


if __name__ == "__main__":
    main()
