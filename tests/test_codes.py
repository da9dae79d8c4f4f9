"""Tests for the self-contained standard LDPC code constructors.

The reference distributes these codes as ALIST data files
(`/root/reference/optic/comm/ALIST/`, 38 files); here they are constructed
from the standards' compact tables, so everything below runs WITHOUT the
reference mount. When the mount is present, an extra test pins every
constructed matrix bit-exactly to the reference asset.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.comm.codes import (
    ar4ja_edges,
    available_ldpc_codes,
    dvbs2_edges,
    ieee80211_edges,
    ldpc_edges,
    ldpc_parity_matrix,
)
from opticommpy_tpu.comm.fec import (
    LDPCConfig,
    decode_ldpc,
    encode_ldpc,
    par2gen,
    standard_ldpc,
)

ALIST_DIR = "/root/reference/optic/comm/ALIST"


def _sparse_parity_ok(edges, cw):
    """Check H @ cw == 0 (mod 2) from the sparse support, per column."""
    n, m, rows, cols = edges
    cw = np.asarray(cw)
    syn = np.zeros((m, cw.shape[1]), dtype=np.int64)
    np.add.at(syn, rows, cw[cols])
    return np.all(syn % 2 == 0)


def test_inventory_matches_reference_asset_list():
    codes = available_ldpc_codes()
    fams = {}
    for mode, n, R in codes:
        fams[mode] = fams.get(mode, 0) + 1
    assert fams == {"DVBS2": 11, "IEEE_802.11nD2": 12, "AR4JA": 14}


@pytest.mark.parametrize("mode,n,R", available_ldpc_codes(),
                         ids=lambda v: str(v).replace("/", ""))
def test_structural_sanity(mode, n, R):
    n_cols, m, rows, cols = ldpc_edges(mode=mode, n=n, R=R)
    assert rows.min() >= 0 and rows.max() == m - 1
    assert cols.min() >= 0 and cols.max() == n_cols - 1
    # no duplicate edges (GF(2) support must be a set)
    eid = rows.astype(np.int64) * n_cols + cols
    assert np.unique(eid).size == eid.size
    # every check touched
    assert np.unique(rows).size == m


DVBS2_RATES = ["1/4", "1/3", "2/5", "1/2", "3/5", "2/3", "3/4",
               "4/5", "5/6", "8/9", "9/10"]


@pytest.mark.parametrize("R", DVBS2_RATES, ids=lambda r: r.replace("/", ""))
def test_dvbs2_all_rates_encode(R):
    """All 11 DVB-S2 long-frame rates encode and satisfy H cw = 0."""
    edges = dvbs2_edges(R=R)
    n, m, _, _ = edges
    k = n - m
    rng = np.random.default_rng(hash(R) % 2**31)
    bits = rng.integers(0, 2, size=(k, 2))
    cw = np.asarray(encode_ldpc(jnp.asarray(bits), edges=edges,
                                config=LDPCConfig(mode="DVBS2")))
    assert cw.shape == (n, 2)
    assert np.array_equal(cw[:k], bits)  # systematic
    assert _sparse_parity_ok(edges, cw)


@pytest.mark.parametrize("R", ["1/2", "2/3", "3/4", "5/6"],
                         ids=lambda r: r.replace("/", ""))
def test_ieee80211_648_encode_decode(R):
    """802.11n 648b at every rate: generator encode + BP decode roundtrip."""
    H = ldpc_parity_matrix(mode="IEEE_802.11nD2", n=648, R=R)
    k = H.shape[1] - H.shape[0]
    G, _, Hm = par2gen(H)
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(k, 2))
    cw = np.asarray(encode_ldpc(jnp.asarray(bits), H=Hm, G=G,
                                config=LDPCConfig(mode="G")))
    assert np.all(np.asarray(Hm, np.int64) @ cw % 2 == 0)
    snr_db = 4.0
    sigma = np.sqrt(0.5 * 10 ** (-snr_db / 10))
    y = (1 - 2.0 * cw) + sigma * rng.normal(size=cw.shape)
    llr = (2 * y / sigma**2).astype(np.float32)
    dec, _, _ = decode_ldpc(jnp.asarray(llr), H=Hm,
                            config=LDPCConfig(maxIter=50))
    assert np.array_equal(np.asarray(dec), cw)


def test_ar4ja_punctured_encode_decode():
    """AR4JA 2048b R1/2: encode full, puncture the tail M, decode."""
    edges = ar4ja_edges(n=2048, R="1/2")
    n_cols, m, rows, cols = edges
    assert n_cols == 2048 + (m // 3)  # punctured block appended
    H = np.zeros((m, n_cols), dtype=np.uint8)
    H[rows, cols] = 1
    G, _, Hm = par2gen(H)
    k = n_cols - m
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=(k, 1))
    cw = np.asarray(encode_ldpc(jnp.asarray(bits), H=Hm, G=G,
                                config=LDPCConfig(mode="G")))
    assert np.all(np.asarray(Hm, np.int64) @ cw % 2 == 0)
    # transmit the first 2048 bits only (CCSDS puncturing); decoder sees
    # zero LLR on the punctured tail
    snr_db = 3.0
    sigma = np.sqrt(0.5 * 10 ** (-snr_db / 10))
    y = (1 - 2.0 * cw) + sigma * rng.normal(size=cw.shape)
    llr = (2 * y / sigma**2).astype(np.float32)
    llr[2048:] = 0.0
    from opticommpy_tpu.comm.fec import ldpc_graph

    dec, _, _ = decode_ldpc(jnp.asarray(llr), graph=ldpc_graph(Hm),
                            config=LDPCConfig(maxIter=60))
    assert np.array_equal(np.asarray(dec), cw)


def test_standard_ldpc_graph_decodes_dvbs2_shortcut():
    """standard_ldpc wires codes.py into the BP decoder in one call."""
    graph, edges = standard_ldpc(mode="IEEE_802.11nD2", n=648, R="1/2")
    assert graph["n"] == 648 and graph["m"] == 324
    n, m, _, _ = edges
    assert (n, m) == (648, 324)


@pytest.mark.skipif(not os.path.isdir(ALIST_DIR),
                    reason="reference ALIST assets not mounted")
@pytest.mark.parametrize("mode,n,R", available_ldpc_codes(),
                         ids=lambda v: str(v).replace("/", ""))
def test_exact_match_vs_reference_alist(mode, n, R):
    """Constructed support == the reference's shipped ALIST, bit for bit."""
    from opticommpy_tpu.comm.fec import read_alist_edges

    n_cols, m, rows, cols = ldpc_edges(mode=mode, n=n, R=R)
    tag = R.replace("/", "")
    path = os.path.join(ALIST_DIR, f"LDPC_{mode}_{n}b_R{tag}.txt")
    n2, m2, r2, c2 = read_alist_edges(path)
    assert (n_cols, m) == (n2, m2)
    mine = np.unique(rows.astype(np.int64) * n_cols + cols)
    ref = np.unique(r2.astype(np.int64) * n_cols + c2)
    assert np.array_equal(mine, ref)
