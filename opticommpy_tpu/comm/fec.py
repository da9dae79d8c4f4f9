"""Forward error correction: LDPC encode/decode, Hamming codes, ALIST I/O.

TPU-native counterpart of reference ``optic/comm/fec.py``:

- GF(2) preprocessing (Gaussian elimination, triangularization, inversion,
  H->G conversion) stays host-side NumPy — it runs once per code, offline
  (reference fec.py:43,102,841,893).
- **Encoding** is batched on-device: GF(2) matrix-vector products become
  padded-gather XOR reductions over the sparse row structure (fec.py:302),
  and the DVB-S2 recursive parity accumulation (fec.py:254,295-297) becomes
  a prefix-XOR = ``cumsum mod 2`` — a parallel scan instead of a sequential
  bit recurrence.
- **Decoding** (sum-product / min-sum belief propagation, fec.py:347,505)
  runs on a *degree-bucketed edge-array* layout (replacing the reference's
  ragged ``numba.typed.List`` CSR walk): check and variable nodes are
  grouped by degree so every per-bucket array is exactly dense — no pads,
  no masks (standard codes have <=5 distinct degrees per side; a uniform
  (n, dv_max) pad wastes ~3x gather bandwidth on DVB-S2 R4/5). Check
  updates are row-wise reductions (prefix/suffix tanh-products or
  min1/min2), and variable updates GATHER each variable's incident edges
  via precomputed index maps (scatter-free: batched scatter-adds crash the
  XLA:TPU compiler on some runtimes, and gathers are faster on TPU
  regardless). Codewords batch on a trailing axis; early stopping is
  realized by freezing converged codewords under a fixed iteration scan
  (bit-identical results to per-codeword early exit). A uniformly padded
  single-bucket variant (`_bp_decode_batch`) is kept for the compat shims.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LDPCConfig",
    "gauss_elim_gf2",
    "inverse_matrix_gf2",
    "triangularize_gf2",
    "par2gen",
    "triang_p1p2",
    "ldpc_graph",
    "ldpc_graph_from_edges",
    "standard_ldpc",
    "encode_ldpc",
    "decode_ldpc",
    "read_alist",
    "read_alist_edges",
    "write_alist",
    "parse_alist",
    "summarize_alist_folder",
    "plot_binary_matrix",
    "hamming_parity_check_matrix",
    "encode_hamming",
    "decode_hamming",
    "gallager_ldpc",
]


# ---------------------------------------------------------------------------
# GF(2) linear algebra (host-side, offline preprocessing)
# ---------------------------------------------------------------------------


def gauss_elim_gf2(M):
    """Row echelon form over GF(2) (reference fec.py:102), vectorized numpy.

    Large matrices take the bit-packed native path
    (`opticommpy_tpu/native/gf2.cpp`, ~30x at AR4JA 20480b) — same pivot
    policy, bit-identical output.
    """
    M = np.array(M, dtype=np.uint8) % 2
    if M.size >= 1 << 16:
        from opticommpy_tpu import native

        out = native.gf2_rref(M)
        if out is not None:
            return out
    rows, cols = M.shape
    lead = 0
    for r in range(rows):
        if lead >= cols:
            break
        pivot_rows = np.nonzero(M[r:, lead])[0]
        while pivot_rows.size == 0:
            lead += 1
            if lead == cols:
                return M
            pivot_rows = np.nonzero(M[r:, lead])[0]
        i = r + pivot_rows[0]
        if i != r:
            M[[r, i]] = M[[i, r]]
        # eliminate the lead column everywhere else (XOR rows at once)
        mask = M[:, lead].copy()
        mask[r] = 0
        M[mask == 1] ^= M[r]
        lead += 1
    return M


def inverse_matrix_gf2(A):
    """Inverse of a square binary matrix over GF(2) (reference fec.py:841).

    Returns (Ainv, success).
    """
    A = np.array(A, dtype=np.uint8) % 2
    n = A.shape[0]
    aug = np.concatenate([A, np.eye(n, dtype=np.uint8)], axis=1)
    for i in range(n):
        pivots = np.nonzero(aug[i:, i])[0]
        if pivots.size == 0:
            return np.eye(n, dtype=np.uint8), False
        j = i + pivots[0]
        if j != i:
            aug[[i, j]] = aug[[j, i]]
        mask = aug[:, i].copy()
        mask[i] = 0
        aug[mask == 1] ^= aug[i]
    return aug[:, n:], True


def triangularize_gf2(H):
    """Lower-triangularize H with row/column permutations (reference fec.py:893).

    Returns (triangH, rowPerm, colPerm).
    """
    H = np.array(H, dtype=np.uint8) % 2
    m, n = H.shape
    row_perm = np.arange(m)
    col_perm = np.arange(n)
    T = H.copy()
    for i in range(m):
        sub = T[i:, i:]
        nz = np.argwhere(sub == 1)
        if nz.size == 0:
            continue
        r, c = nz[0]
        r += i
        c += i
        if r != i:
            T[[i, r]] = T[[r, i]]
            row_perm[[i, r]] = row_perm[[r, i]]
        if c != i:
            T[:, [i, c]] = T[:, [c, i]]
            col_perm[[i, c]] = col_perm[[c, i]]
        below = np.nonzero(T[i + 1 :, i])[0] + i + 1
        T[below] ^= T[i]
    return T, row_perm, col_perm


def par2gen(H):
    """Systematic generator matrix G = [I_k | P] from H (reference fec.py:43).

    Returns (G, colSwaps, Hm) with Hm = [P^T | I_r] the column-permuted,
    row-reduced parity-check matrix matching G (so G @ Hm^T = 0 over GF(2)).
    Unlike the reference (which assumes full-rank H and identifies the
    identity part by column sums), pivot columns are taken from the reduced
    row echelon form, so rank-deficient matrices are handled (k = n - rank).
    """
    H = _dense(H)
    n = H.shape[1]
    E = gauss_elim_gf2(H)  # Gauss-Jordan: reduced row echelon form
    nonzero_rows = np.nonzero(E.any(axis=1))[0]
    E = E[nonzero_rows]
    r = E.shape[0]  # rank
    k = n - r
    pivot_cols = np.array([np.nonzero(E[i])[0][0] for i in range(r)])
    nonpivot_cols = np.setdiff1d(np.arange(n), pivot_cols)
    Em = np.concatenate([E[:, nonpivot_cols], E[:, pivot_cols]], axis=1)
    col_swaps = np.concatenate([nonpivot_cols, pivot_cols])
    G = np.concatenate([np.eye(k, dtype=np.uint8), Em[:, :k].T], axis=1)
    # return the column-permuted ORIGINAL H (sparse), not the eliminated form:
    # BP decoding needs the low-degree graph (reference fec.py:100 does the
    # same); G is orthogonal to it since rowspace(E) = rowspace(H)
    return G, col_swaps, H[:, col_swaps]


def triang_p1p2(H):
    """Richardson-Urbanke triangular encoder matrices (reference fec.py:955).

    Returns (P1, P2, Hm) such that parities are p1 = P1@u, p2 = P2@u over
    GF(2), or (None, None, None) if the required submatrices are singular.
    """
    H = _dense(H)
    T, _, col_swaps = triangularize_gf2(H)
    m, n = T.shape
    k = n - m
    idx = np.where(T[:, -1] == 1)[0]
    g = m - idx.min() - 1
    E = T[m - g :, n - (m - g) :]
    Tm = T[: m - g, n - (m - g) :]
    A = T[: m - g, :k]
    B = T[: m - g, k : k + g]
    C = T[m - g :, :k]
    D = T[m - g :, k : k + g]
    T_inv, ok = inverse_matrix_gf2(Tm)
    if not ok:
        return None, None, None
    X = (E @ T_inv) % 2
    C_t = (X @ A + C) % 2
    D_t = (X @ B + D) % 2
    D_t_inv, ok = inverse_matrix_gf2(D_t)
    if not ok:
        return None, None, None
    P1 = (D_t_inv @ C_t) % 2
    P2 = (T_inv @ ((A + (B @ P1) % 2) % 2)) % 2
    return P1.astype(np.uint8), P2.astype(np.uint8), H[:, col_swaps]


def _dense(H):
    if hasattr(H, "todense"):
        return np.asarray(H.todense(), dtype=np.uint8)
    return np.asarray(H, dtype=np.uint8)


# ---------------------------------------------------------------------------
# ALIST I/O (reference fec.py:761,811,1100)
# ---------------------------------------------------------------------------


def read_alist_edges(filename):
    """Read an ALIST file into its sparse support: ``(n, m, rows, cols)``.

    The (rows, cols) int32 edge arrays are the nonzero coordinates of the
    (m, n) parity-check matrix — the structure :func:`ldpc_graph` consumes.
    Uses the native C++ loader (`opticommpy_tpu.native`) when available
    (~100x the pure-Python parse at DVB-S2 size), else a Python fallback.
    """
    from opticommpy_tpu import native

    parsed = native.alist_edges(filename)
    if parsed is not None:
        return parsed
    with open(filename) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n, m = map(int, lines[0].split())
    rows, cols = [], []
    for j, line in enumerate(lines[4 : 4 + n]):
        for entry in map(int, line.split()):
            if entry > 0:
                rows.append(entry - 1)
                cols.append(j)
    return n, m, np.asarray(rows, np.int32), np.asarray(cols, np.int32)


def read_alist(filename):
    """Read an ALIST file into a dense (m, n) uint8 parity-check matrix."""
    n, m, rows, cols = read_alist_edges(filename)
    H = np.zeros((m, n), dtype=np.uint8)
    H[rows, cols] = 1
    return H


def write_alist(H, filename):
    """Save a binary parity-check matrix to ALIST format."""
    H = _dense(H)
    m, n = H.shape
    var_deg = H.sum(axis=0)
    chk_deg = H.sum(axis=1)
    max_col = int(var_deg.max())
    max_row = int(chk_deg.max())
    with open(filename, "w") as f:
        f.write(f"{n} {m}\n{max_col} {max_row}\n")
        f.write(" ".join(map(str, var_deg)) + "\n")
        f.write(" ".join(map(str, chk_deg)) + "\n")
        for j in range(n):
            conn = list(np.nonzero(H[:, j])[0] + 1) + [0] * (max_col - var_deg[j])
            f.write(" ".join(map(str, conn)) + "\n")
        for i in range(m):
            conn = list(np.nonzero(H[i])[0] + 1) + [0] * (max_row - chk_deg[i])
            f.write(" ".join(map(str, conn)) + "\n")


def parse_alist(path):
    """Basic parameters of an ALIST file (reference fec.py:1100)."""
    n, m, rows, cols = read_alist_edges(path)
    col_w = np.bincount(cols, minlength=n)
    row_w = np.bincount(rows, minlength=m)
    return {
        "n": n,
        "m": m,
        "rate": (n - m) / n if n else 0,
        "max_col_w": int(col_w.max()) if col_w.size else 0,
        "max_row_w": int(row_w.max()) if row_w.size else 0,
    }


def summarize_alist_folder(folder_path):
    """Summarize every ALIST file in a folder as a text table (fec.py:1139).

    Scans ``folder_path`` for ``.alist``/``.txt`` files, parses each with
    :func:`parse_alist`, prints and returns the summary table.
    """
    import os

    header = ("File", "n (length)", "m (checks)", "Rate", "Max Var Deg",
              "Max Check Deg")
    rows = []
    for filename in sorted(os.listdir(folder_path)):
        if not (filename.endswith(".alist") or filename.endswith(".txt")):
            continue
        try:
            info = parse_alist(os.path.join(folder_path, filename))
        except Exception as exc:  # noqa: BLE001 - mirror reference tolerance
            print(f"Failed to parse {filename}: {exc}")
            continue
        rows.append((filename, str(info["n"]), str(info["m"]),
                     f"{info['rate']:.3f}", str(info["max_col_w"]),
                     str(info["max_row_w"])))
    widths = [max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
              for i, h in enumerate(header)]
    fmt = " | ".join(f"{{:<{w}}}" for w in widths)
    lines = [fmt.format(*header), "-+-".join("-" * w for w in widths)]
    lines += [fmt.format(*r) for r in rows]
    table = "\n".join(lines)
    print(table)
    return table


def plot_binary_matrix(H, ax=None):
    """Scatter-plot the support of a binary matrix (reference fec.py:1075)."""
    import matplotlib.pyplot as plt

    H = _dense(H)
    rows, cols = np.where(H == 1)
    if ax is None:
        ax = plt.gca()
    ax.scatter(cols, rows, s=10 / max(H.shape[0], 1), color="blue")
    ax.set_xlabel("Column indexes")
    ax.set_ylabel("Row indexes")
    ax.set_title(f"Matrix: {H.shape[0]} x {H.shape[1]}")
    ax.set_xlim(0, H.shape[1])
    ax.set_ylim(H.shape[0], 0)
    ax.grid(True)
    return ax


# ---------------------------------------------------------------------------
# Code constructions
# ---------------------------------------------------------------------------


def hamming_parity_check_matrix(m, extended=False):
    """Hamming (or extended Hamming) parity-check matrix (reference fec.py:1180)."""
    if m < 1:
        raise ValueError("m must be a positive integer.")
    n_std = 2**m - 1
    cols = np.arange(1, n_std + 1)
    # column j is the binary representation of j, LSB at top
    H_std = ((cols[None, :] >> np.arange(m)[:, None]) & 1).astype(np.uint8)
    if not extended:
        return H_std
    H_ext = np.zeros((m + 1, n_std + 1), dtype=np.uint8)
    H_ext[:m, :n_std] = H_std
    H_ext[m, :] = 1
    return H_ext


def gallager_ldpc(n, dv, dc, seed=0):
    """Random regular (dv, dc) LDPC parity-check matrix (Gallager ensemble).

    A compact built-in construction for demos/tests; standard code matrices
    (DVB-S2, IEEE 802.11n, AR4JA) load from ALIST files via
    :func:`read_alist` exactly as the reference's shipped assets do.
    """
    if (n * dv) % dc != 0:
        raise ValueError("n*dv must be divisible by dc")
    m = n * dv // dc
    rng = np.random.default_rng(seed)
    rows_per_block = m // dv
    if rows_per_block * dc != n:
        raise ValueError("inconsistent (n, dv, dc)")
    H = np.zeros((m, n), dtype=np.uint8)
    for b in range(dv):
        perm = rng.permutation(n)
        for r in range(rows_per_block):
            H[b * rows_per_block + r, perm[r * dc : (r + 1) * dc]] = 1
    return H


# ---------------------------------------------------------------------------
# Encoding (on-device, batched over codewords)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LDPCConfig:
    """LDPC code configuration (reference fec.py:153 semantics).

    ``mode`` selects the encoder: 'DVBS2' (sparse A + prefix-XOR recursion),
    'triang' (Richardson-Urbanke P1/P2), or 'G' (systematic generator).
    """

    mode: str = "DVBS2"
    maxIter: int = 25
    # 'SPA' | 'MSA' (reference parity) | 'NMSA' (normalized min-sum,
    # check messages scaled by 0.75 — recovers most of min-sum's ~0.5 dB
    # loss vs SPA at SPA-free cost; not in the reference)
    alg: str = "SPA"
    clipLLR: float = 200.0
    # BP message storage dtype: 'f32' or 'bf16'. bf16 halves the decoder's
    # HBM traffic (the E x batch message arrays dominate; DVB-S2 64800b at
    # batch 128 moves ~0.5 GB/iteration in f32) and costs <0.05 dB for
    # min-sum (sign/min are exact in bf16; only the stored magnitudes
    # round). Totals/LLRs always accumulate in f32.
    msgDtype: str = "f32"
    # Stop iterating once EVERY codeword in the batch converged (identical
    # outputs to the fixed-trip path — per-codeword results freeze at
    # their own convergence; QC decoder only). while_loop, so wall time
    # tracks the slowest codeword instead of maxIter.
    earlyExit: bool = False
    # BP message-passing schedule: 'flooding' (the reference's; all
    # backends bit-comparable) or 'layered' (serial-C inside the DVB-S2
    # QC megakernel only — ~1.8x fewer sweeps to convergence, cashed via
    # earlyExit; decisions can differ from flooding on marginal
    # codewords, FER equal or better). 'layered' raises for non-QC
    # graphs.
    schedule: str = "flooding"


def _padded_rows(rows, cols, m, dmax=None, fill=0):
    """(m, dmax) padded row arrays from sorted-by-row edge coordinates."""
    counts = np.bincount(rows, minlength=m)
    if dmax is None:
        dmax = max(int(counts.max()) if counts.size else 1, 1)
    # position of each edge within its row (edges already row-major sorted)
    pos = np.arange(rows.size) - np.repeat(np.cumsum(counts) - counts, counts)
    idx = np.full((m, dmax), fill, dtype=np.int32)
    mask = np.zeros((m, dmax), dtype=bool)
    idx[rows, pos] = cols
    mask[rows, pos] = True
    return idx, mask


def _sparse_rows(M, pad_to=None):
    """Row-sparse representation: (indices (m, dmax), mask (m, dmax))."""
    M = _dense(M)
    rows, cols = np.nonzero(M)  # C-order scan: already row-major sorted
    idx, mask = _padded_rows(rows, cols, M.shape[0], dmax=pad_to)
    return idx, mask


@partial(jax.jit, static_argnames=())
def _gf2_matvec_sparse(idx, mask, bits):
    """XOR of bits gathered along sparse rows: (m, dmax) x (n, N) -> (m, N)."""
    gathered = bits[idx]  # (m, dmax, N)
    gathered = jnp.where(mask[..., None], gathered, 0)
    return jnp.sum(gathered, axis=1) % 2


def _dvbs2_encoder_support(n, m, rows, cols):
    """Row-sparse (idx, mask) of the info part A = H[:, :k] from edges."""
    k = n - m
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    sel = cols < k
    r, c = rows[sel], cols[sel]
    order = np.lexsort((c, r))
    return _padded_rows(r[order], c[order], m)


def encode_ldpc(bits, H=None, config: LDPCConfig = LDPCConfig(), G=None,
                P1=None, P2=None, edges=None):
    """Encode (k, N) bit columns into (n, N) codewords (reference fec.py:153).

    - mode 'DVBS2': parity = prefix-XOR of A@u where A = H[:, :k]
      (the reference's sequential recursion fec.py:295-297 becomes
      ``cumsum mod 2`` — a parallel scan). Pass ``edges=(n, m, rows, cols)``
      (e.g. from :func:`standard_ldpc`) to skip the dense H detour — at
      DVB-S2 64800b the dense A alone is ~2 GB.
    - mode 'triang': codeword = [u, P1@u, P2@u].
    - mode 'G': codeword = G^T u (systematic).
    """
    bits = jnp.asarray(bits).astype(jnp.int32)
    if config.mode == "DVBS2":
        if edges is not None:
            idx, mask = _dvbs2_encoder_support(*edges)
        else:
            H = _dense(H)
            k = H.shape[1] - H.shape[0]
            idx, mask = _sparse_rows(H[:, :k])
        parity = _gf2_matvec_sparse(jnp.asarray(idx), jnp.asarray(mask), bits)
        parity = jnp.cumsum(parity, axis=0) % 2  # recursive accumulation
        return jnp.concatenate([bits, parity], axis=0).astype(jnp.int8)
    elif config.mode == "triang":
        if P1 is None or P2 is None:
            P1, P2, _ = triang_p1p2(H)
            if P1 is None:
                raise ValueError("H cannot be triangularized; use mode='G'.")
        i1, m1 = _sparse_rows(P1)
        i2, m2 = _sparse_rows(P2)
        p1 = _gf2_matvec_sparse(jnp.asarray(i1), jnp.asarray(m1), bits)
        p2 = _gf2_matvec_sparse(jnp.asarray(i2), jnp.asarray(m2), bits)
        return jnp.concatenate([bits, p1, p2], axis=0).astype(jnp.int8)
    elif config.mode == "G":
        if G is None:
            G, _, _ = par2gen(H)
        G = _dense(G)
        k = G.shape[0]
        idx, mask = _sparse_rows(G[:, k:].T)  # parity part rows
        parity = _gf2_matvec_sparse(jnp.asarray(idx), jnp.asarray(mask), bits)
        return jnp.concatenate([bits, parity], axis=0).astype(jnp.int8)
    raise ValueError(f"Unsupported mode: {config.mode}")


def encode_hamming(bits, m=3, extended=False):
    """Hamming encoding (reference fec.py:1257). Returns (codewords, Hm)."""
    H = hamming_parity_check_matrix(m, extended)
    G, _, Hm = par2gen(H)
    if bits.shape[0] != G.shape[0]:
        raise ValueError(
            f"Input bits have {bits.shape[0]} rows, expected {G.shape[0]}."
        )
    cw = encode_ldpc(bits, H=Hm, config=LDPCConfig(mode="G"), G=G)
    return cw, Hm


# ---------------------------------------------------------------------------
# Decoding: belief propagation on padded edge arrays
# ---------------------------------------------------------------------------


def ldpc_graph(H):
    """Precompute the padded edge-array graph of H for BP decoding.

    Returns a dict of numpy arrays:
    - cn_idx (m, dc_max): variable index of each check-incident edge
    - cn_mask (m, dc_max): edge validity
    - edge_var (E,): variable index per edge (row-major over cn grid)
    - n, m, dc_max
    """
    H = _dense(H)
    m, n = H.shape
    rows, cols = np.nonzero(H)  # C-order: row-major sorted
    return ldpc_graph_from_edges(n, m, rows, cols)


def ldpc_graph_from_edges(n, m, rows, cols):
    """:func:`ldpc_graph` from the sparse support directly.

    Composes with :func:`read_alist_edges` so a decoding graph is built from
    an ALIST file without materializing the dense H (at DVB-S2 64800b the
    dense detour costs ~0.7 GB plus seconds of Python loops).
    """
    order = np.lexsort((cols, rows))  # row-major edge order
    rows = np.asarray(rows, dtype=np.int64)[order]
    cols = np.asarray(cols, dtype=np.int64)[order]
    cn_idx, cn_mask = _padded_rows(rows, cols, m)
    edge_var = cn_idx.reshape(-1)
    # variable-side inverse map: the flat edge ids incident to each variable,
    # padded with E (which indexes a zero sentinel appended to the flat
    # message array). Turns the variable update into a GATHER — scatter-adds
    # (segment_sum) under vmap crash the XLA:TPU compiler on some runtimes
    # and are slower than gathers on TPU anyway.
    E = edge_var.size
    flat_e = np.flatnonzero(cn_mask.reshape(-1))
    v = edge_var[flat_e]
    vo = np.argsort(v, kind="stable")  # stable: keeps edge ids ascending
    vn_edge, _ = _padded_rows(v[vo], flat_e[vo], n, fill=E)
    return {
        "cn_idx": cn_idx,
        "cn_mask": cn_mask,
        "edge_var": edge_var,
        "vn_edge": vn_edge,
        "n": n,
        "m": m,
        "dc_max": cn_idx.shape[1],
        "bk": _bucketize(n, m, rows, cols),
    }


def standard_ldpc(mode="DVBS2", n=64800, R="4/5"):
    """Decoding graph + sparse support for a built-in standard code.

    Self-contained replacement for the reference's ALIST data distribution
    (fec.py:197, 39 MB of files): H is constructed from the standard's own
    compact tables (:mod:`opticommpy_tpu.comm.codes`). Same (mode, n, R)
    naming as the reference's filename scheme.

    Returns ``(graph, edges)``: pass ``graph=`` to :func:`decode_ldpc` and
    ``edges=`` to :func:`encode_ldpc` (DVBS2 mode), or densify ``edges`` for
    the triangular/generator encoders.
    """
    from opticommpy_tpu.comm.codes import ldpc_edges

    edges = ldpc_edges(mode=mode, n=n, R=R)
    graph = ldpc_graph_from_edges(*edges)
    if mode == "DVBS2":
        # quasi-cyclic layout: BP via cyclic rolls instead of gathers
        # (fec_qc.py; ~7x decode throughput on TPU at n=64800)
        graph["qc"] = {"n": n, "R": R if isinstance(R, str) else str(R)}
    else:
        # 802.11n / AR4JA are lifted-circulant too: same roll-based
        # decode through the generic lift layout (fec_lift.py)
        graph["lift"] = {"mode": mode, "n": n,
                         "R": R if isinstance(R, str) else str(R)}
    return graph, edges


def _bucketize(n, m, rows, cols):
    """Degree-bucketed, padding-free BP graph layout.

    Standard codes are degree-irregular (DVB-S2 R4/5: dv in {2,3,11}, so a
    uniform (n, dv_max) pad wastes ~3x gather bandwidth; AR4JA wastes ~1.7x
    on BOTH sides). Grouping nodes by degree makes every per-bucket array
    exactly dense — no masks, no sentinel rows — at the cost of <=5 small
    kernels per side (standard codes have <=5 distinct degrees per side).

    Flat edge order = check buckets ascending by (degree, check id), each
    check's edges ascending by variable. Returns numpy arrays:

    - ``cn_var``: tuple of (m_b, d_b) canonical variable ids per check edge;
      bucket b's messages are the flat slice of length ``m_b*d_b`` starting
      at the previous buckets' total size (static offsets).
    - ``vn_edge``: tuple of (n_b, d_b) flat edge positions per variable
      (degree-0 variables form an (n_0, 0) bucket — the empty gather sums
      to zero, so one uniform code path).
    - ``vn_var``: tuple of (n_b,) canonical variable ids, same bucket order.
    - ``var_pos``: (n,) position of each canonical variable in the
      concatenation of per-bucket totals (inverse permutation gather —
      scatter-free by construction, like the padded layout above).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    dc = np.bincount(rows, minlength=m)
    eorder = np.lexsort((cols, rows, dc[rows]))
    c = cols[eorder]
    cn_var = []
    start = 0
    for d in np.unique(dc):
        if d == 0:
            continue  # empty checks are trivially satisfied
        n_b = int(np.count_nonzero(dc == d))
        cnt = n_b * int(d)
        cn_var.append(c[start:start + cnt].reshape(n_b, int(d))
                      .astype(np.int32))
        start += cnt
    # variable buckets over flat edge positions
    dv = np.bincount(c, minlength=n)
    pos = np.arange(c.size, dtype=np.int64)
    vorder = np.lexsort((pos, c, dv[c]))
    vs, ps = c[vorder], pos[vorder]
    vn_edge, vn_var = [], []
    start = 0
    for d in np.unique(dv):
        ids = np.flatnonzero(dv == d).astype(np.int32)
        if d == 0:
            vn_edge.append(np.zeros((ids.size, 0), dtype=np.int32))
            vn_var.append(ids)
            continue
        cnt = ids.size * int(d)
        vn_edge.append(ps[start:start + cnt].reshape(ids.size, int(d))
                       .astype(np.int32))
        vn_var.append(vs[start:start + cnt:int(d)].astype(np.int32))
        start += cnt
    var_order = np.concatenate(vn_var)
    var_pos = np.empty(n, dtype=np.int32)
    var_pos[var_order] = np.arange(n, dtype=np.int32)
    return {
        "cn_var": tuple(cn_var),
        "vn_edge": tuple(vn_edge),
        "vn_var": tuple(vn_var),
        "var_pos": var_pos,
    }


# Normalized min-sum scaling (alg='NMSA'). 0.75 is the standard choice
# (Chen & Fossorier, IEEE Trans. Comm. 2002) and is exact in bf16.
_NMSA_ALPHA = 0.75


def _select_check_update(alg):
    """Dense-bucket check update for 'SPA' | 'MSA' | 'NMSA'."""
    if alg == "SPA":
        return _check_update_spa_dense
    if alg == "NMSA":
        return lambda x: _NMSA_ALPHA * _check_update_msa_dense(x)
    return _check_update_msa_dense


def _check_update_spa_dense(x):
    """SPA check update on one exactly-dense (m_b, d_b) bucket.

    Leave-one-out products as explicit prefix/suffix slab chains (cumprod
    lowers to O(log d) full-tensor passes on TPU; the chain streams each
    (m_b, 1) slab once — same association order, identical results)."""
    d = x.shape[1]
    t = jnp.tanh(x / 2.0)
    one = jnp.ones_like(t[:, :1])
    fe = [one]
    for i in range(1, d):
        fe.append(fe[-1] * t[:, i - 1:i])
    be = [one]
    for i in range(d - 1, 0, -1):
        be.append(be[-1] * t[:, i:i + 1])
    be.reverse()
    prod = jnp.concatenate([f * b for f, b in zip(fe, be)], axis=1)
    prod = jnp.clip(prod, -0.999999, 0.999999)
    return 2.0 * jnp.arctanh(prod)


def _check_update_msa_dense(x):
    """Min-sum check update on one exactly-dense (m_b, d_b) bucket.

    Exact exclusive-min via prefix/suffix min chains — no argmin (the
    argmin and sign-product forms crash the XLA:TPU compiler under vmap)
    and no cumsum (O(log d) full-tensor passes); sign via total parity XOR
    own sign."""
    d = x.shape[1]
    mag = jnp.abs(x)
    inf = jnp.full_like(mag[:, :1], jnp.inf)
    fe = [inf]  # fe[i] = min(mag[:, :i])
    for i in range(1, d):
        fe.append(jnp.minimum(fe[-1], mag[:, i - 1:i]))
    be = [inf]  # be[i] = min(mag[:, i+1:])
    for i in range(d - 1, 0, -1):
        be.append(jnp.minimum(be[-1], mag[:, i:i + 1]))
    be.reverse()
    out_mag = jnp.concatenate(
        [jnp.minimum(f, b) for f, b in zip(fe, be)], axis=1)
    neg = x < 0
    par = jnp.sum(neg, axis=1, keepdims=True, dtype=jnp.int32) % 2
    flip = jnp.where(neg, 1 - par, par)
    return jnp.where(flip == 1, -out_mag, out_mag)


def _bp_decode_bucketed(llr, cn_var, vn_edge, vn_var, var_pos, max_iter,
                        alg, msg_dtype=jnp.float32):
    """BP decode one codeword on the degree-bucketed graph. llr: (n,).

    ``msg_dtype`` is the storage dtype of the (E,)-edge message carries —
    the decoder's HBM working set. Check/variable math always runs in f32;
    only the stored messages round (bf16: sign and min exact, magnitudes to
    8-bit mantissa — standard min-sum quantization headroom).
    """
    check_update = _select_check_update(alg)
    sizes = [a.size for a in cn_var]
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    edge_var_flat = jnp.concatenate([a.reshape(-1) for a in cn_var])
    # Edge -> position of its variable's total in BUCKET order. Composing
    # var_pos into the edge gather at trace time removes the per-iteration
    # (n,) reorder; totals stay in bucket order until after the scan.
    edge_tot_idx = var_pos[edge_var_flat]
    # llr in bucket order: per-bucket slices become static, not gathers.
    llr_bucket = jnp.concatenate([llr[vv] for vv in vn_var])
    voffs = np.concatenate(
        [[0], np.cumsum([v.size for v in vn_var])]).tolist()

    def iteration(carry, _):
        flat_vc, done, final_tot, n_iters = carry
        flat_cv = jnp.concatenate([
            check_update(flat_vc[offs[i]:offs[i + 1]].reshape(cv.shape)
                         .astype(jnp.float32)).astype(msg_dtype)
            .reshape(-1)
            for i, cv in enumerate(cn_var)
        ])
        # variable update: exactly-dense per-degree gathers (bucket order)
        totals = jnp.concatenate([
            llr_bucket[voffs[i]:voffs[i + 1]]
            + jnp.sum(flat_cv[ve].astype(jnp.float32), axis=1)
            for i, ve in enumerate(vn_edge)
        ])
        tot_edges = totals[edge_tot_idx]  # (E,) — also feeds the parity check
        new_vc = (tot_edges - flat_cv.astype(jnp.float32)).astype(msg_dtype)
        # parity check on hard decisions, reusing the edge-gathered totals
        # (one E-gather per iteration instead of two)
        bits_e = (tot_edges < 0).astype(jnp.int32)
        ok = jnp.asarray(True)
        for i, cv in enumerate(cn_var):
            be = bits_e[offs[i]:offs[i + 1]].reshape(cv.shape)
            ok = ok & jnp.all(jnp.sum(be, axis=1) % 2 == 0)
        # freeze once converged (matches the reference's early exit)
        final_tot = jnp.where(done, final_tot, totals)
        flat_vc = jnp.where(done, flat_vc, new_vc)
        n_iters = jnp.where(done, n_iters, n_iters + 1)
        done = done | ok
        return (flat_vc, done, final_tot, n_iters), None

    carry0 = (llr[edge_var_flat].astype(msg_dtype), jnp.asarray(False),
              llr_bucket, jnp.asarray(0))
    (_, done, final_tot, n_iters), _ = jax.lax.scan(
        iteration, carry0, None, length=max_iter
    )
    return final_tot[var_pos], n_iters, ~done


@partial(jax.jit, static_argnames=("max_iter", "alg", "msg_dtype"))
def _bp_decode_bucketed_batch(llrs, cn_var, vn_edge, vn_var, var_pos,
                              max_iter, alg, msg_dtype=jnp.float32):
    return jax.vmap(
        lambda l: _bp_decode_bucketed(l, cn_var, vn_edge, vn_var, var_pos,
                                      max_iter, alg, msg_dtype),
        in_axes=1,
        out_axes=(1, 0, 0),
    )(llrs)


def _bp_decode(llr, cn_idx, cn_mask, vn_edge, n, max_iter, alg):
    """BP decode one codeword. llr: (n,). Returns (final_llr, n_iters, fail)."""
    m, dc = cn_idx.shape

    def check_update_spa(msg_vc):
        t = jnp.tanh(msg_vc / 2.0)
        t = jnp.where(cn_mask, t, 1.0)
        # leave-one-out product per row as exclusive prefix x suffix
        # cumulative products — O(dc) (the reference's per-edge form is
        # O(dc^2), fec.py:443)
        f = jnp.cumprod(t, axis=1)
        fe = jnp.concatenate([jnp.ones((m, 1), t.dtype), f[:, :-1]], axis=1)
        b = jnp.cumprod(t[:, ::-1], axis=1)[:, ::-1]
        be = jnp.concatenate([b[:, 1:], jnp.ones((m, 1), t.dtype)], axis=1)
        prod = jnp.clip(fe * be, -0.999999, 0.999999)
        return jnp.where(cn_mask, 2.0 * jnp.arctanh(prod), 0.0)

    def check_update_msa(msg_vc):
        mag = jnp.where(cn_mask, jnp.abs(msg_vc), jnp.inf)
        min1 = jnp.min(mag, axis=1, keepdims=True)
        # first-occurrence-of-min mask without argmin (argmin over the padded
        # axis crashes/hangs the XLA:TPU compiler under vmap on this runtime);
        # duplicate minima resolve like argmin: first copy excluded, min2 =
        # the surviving copy
        at_min = mag == min1
        is_min1 = at_min & (jnp.cumsum(at_min, axis=1) == 1)
        min2 = jnp.min(jnp.where(is_min1, jnp.inf, mag), axis=1, keepdims=True)
        out_mag = jnp.where(is_min1, min2, min1)
        # leave-one-out sign via parity of the OTHER negative messages — a
        # float sign-product reduction feeding the min dataflow also
        # SIGSEGVs the XLA:TPU compiler under vmap; the integer-parity form
        # is equivalent (sign(0) counts as +1, like the reference) and
        # compiles fine
        neg = ((msg_vc < 0) & cn_mask).astype(jnp.int32)
        others = jnp.sum(neg, axis=1, keepdims=True) - neg
        out_sgn = (1 - 2 * (others % 2)).astype(msg_vc.dtype)
        return jnp.where(cn_mask, out_sgn * out_mag, 0.0)

    if alg == "SPA":
        check_update = check_update_spa
    elif alg == "NMSA":
        check_update = lambda x: _NMSA_ALPHA * check_update_msa(x)
    else:
        check_update = check_update_msa

    def iteration(carry, _):
        msg_vc, done, final_llr, n_iters = carry
        msg_cv = check_update(msg_vc)
        # variable update: gather each variable's incident edges (vn_edge
        # pads with index E -> the appended zero), no scatter needed
        flat = jnp.concatenate(
            [msg_cv.reshape(-1), jnp.zeros((1,), msg_cv.dtype)]
        )
        sums = jnp.sum(flat[vn_edge], axis=1)
        total = llr + sums  # (n,)
        new_vc = total[cn_idx] - msg_cv
        new_vc = jnp.where(cn_mask, new_vc, 0.0)
        # parity check on hard decisions
        bits = (total < 0).astype(jnp.int32)
        par = jnp.sum(jnp.where(cn_mask, bits[cn_idx], 0), axis=1) % 2
        ok = jnp.all(par == 0)
        # freeze once converged (matches the reference's early exit)
        final_llr = jnp.where(done, final_llr, total)
        msg_vc = jnp.where(done, msg_vc, new_vc)
        n_iters = jnp.where(done, n_iters, n_iters + 1)
        done = done | ok
        return (msg_vc, done, final_llr, n_iters), None

    msg0 = jnp.where(cn_mask, llr[cn_idx], 0.0)
    carry0 = (msg0, jnp.asarray(False), llr, jnp.asarray(0))
    (msg_vc, done, final_llr, n_iters), _ = jax.lax.scan(
        iteration, carry0, None, length=max_iter
    )
    return final_llr, n_iters, ~done


@partial(jax.jit, static_argnames=("n", "max_iter", "alg"))
def _bp_decode_batch(llrs, cn_idx, cn_mask, vn_edge, n, max_iter, alg):
    return jax.vmap(
        lambda l: _bp_decode(l, cn_idx, cn_mask, vn_edge, n, max_iter, alg),
        in_axes=1,
        out_axes=(1, 0, 0),
    )(llrs)


def decode_ldpc(llrs, H=None, config: LDPCConfig = LDPCConfig(), graph=None):
    """Decode (n, N) LLR columns with belief propagation (reference fec.py:684).

    Returns (decodedBits (n, N) int8, outputLLRs (n, N), frameErrors (N,)).
    Punctured inputs (fewer rows than n) are zero-padded like the reference.
    """
    if graph is None:
        graph = ldpc_graph(H)
    n = graph["n"]
    llrs = jnp.clip(jnp.asarray(llrs, dtype=jnp.float32), -config.clipLLR,
                    config.clipLLR)
    n_in = llrs.shape[0]
    if n_in < n:
        llrs = jnp.pad(llrs, ((0, n - n_in), (0, 0)))

    qc = graph.get("qc")
    lift = graph.get("lift")
    if config.schedule == "layered" and qc is None:
        raise ValueError(
            "LDPCConfig.schedule='layered' is implemented for DVB-S2 "
            "quasi-cyclic graphs only (the megakernel); use 'flooding'")
    if config.earlyExit and qc is None and lift is None:
        import warnings

        warnings.warn(
            "LDPCConfig.earlyExit is only implemented for lifted-circulant "
            "graphs (DVB-S2 / 802.11n / AR4JA); this code decodes with "
            "fixed maxIter trips.", stacklevel=2)
    if qc is not None:
        # DVB-S2 quasi-cyclic path: permutations as cyclic rolls (fec_qc.py)
        from opticommpy_tpu.comm import fec_qc

        dec = fec_qc.make_qc_decoder(
            qc["n"], qc["R"], int(config.maxIter), config.alg,
            config.msgDtype, bool(config.earlyExit),
            schedule=config.schedule)
        out_llr, n_iters, fail = dec(llrs)
    elif lift is not None:
        # 802.11n / AR4JA lifted-circulant path: rolls, not gathers
        from opticommpy_tpu.comm import fec_lift

        dec = fec_lift.make_lift_decoder(
            lift["mode"], lift["n"], lift["R"], int(config.maxIter),
            config.alg, config.msgDtype, bool(config.earlyExit))
        out_llr, n_iters, fail = dec(llrs)
    elif graph.get("bk") is not None:
        bk = graph["bk"]
        # degree-bucketed padding-free layout (1.7-3x less gather traffic
        # than the uniform pad on DVB-S2/AR4JA/802.11n degree profiles)
        out_llr, n_iters, fail = _bp_decode_bucketed_batch(
            llrs,
            tuple(jnp.asarray(a) for a in bk["cn_var"]),
            tuple(jnp.asarray(a) for a in bk["vn_edge"]),
            tuple(jnp.asarray(a) for a in bk["vn_var"]),
            jnp.asarray(bk["var_pos"]),
            int(config.maxIter),
            config.alg,
            jnp.bfloat16 if config.msgDtype == "bf16" else jnp.float32,
        )
    else:
        out_llr, n_iters, fail = _bp_decode_batch(
            llrs,
            jnp.asarray(graph["cn_idx"]),
            jnp.asarray(graph["cn_mask"]),
            jnp.asarray(graph["vn_edge"]),
            n,
            int(config.maxIter),
            config.alg,
        )
    if n_in < n:
        out_llr = out_llr[:n_in]
    decoded = (out_llr < 0).astype(jnp.int8)
    return decoded, out_llr, fail.astype(jnp.int8)


def decode_hamming(llrs, m=3, extended=False, max_iter=25):
    """Soft-decision Hamming decoding via BP on the Hamming graph."""
    H = hamming_parity_check_matrix(m, extended)
    _, _, Hm = par2gen(H)
    return decode_ldpc(llrs, H=Hm, config=LDPCConfig(maxIter=max_iter))
