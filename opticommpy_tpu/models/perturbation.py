"""First-order intrachannel nonlinear perturbation model (NLIN).

TPU-native counterpart of reference ``optic/models/perturbation.py`` (Tao et
al. 2015 / da Silva et al. 2019):

- :func:`calc_pert_coeff_matrix` ~ perturbation.py:29 — coefficient matrices
  (IFWM/IXPM/ISPM, optional power-weighted multi-span form) computed host-side
  with SciPy special functions (offline setup).
- :func:`calc_nlin_perturbation` ~ perturbation.py:200 — the reference's
  heaviest data-parallel kernel (a (2L+1)^2 window contraction per symbol,
  prange over symbols). Default method='fft': the double sum factors into
  per-lag products and one batched FFT correlation (O(L N log N), ~10x the
  windowed form; `_nlin_kernel_fft`). method='chunk' keeps the direct
  (chunk, 2L+1, 2L+1) triple-product tensor contraction as the oracle.
  The IXPM phase terms reduce to FIR correlations of |x|^2.
- :func:`perturbation_nlin` ~ perturbation.py:505 — additive+multiplicative
  NLIN assembly.

Index conventions match the reference exactly (derived from its gather
arithmetic): with m the column offset and n the row offset,
``dx[t] = sum_{m,n} C_ifwm[n,m] (x[t+n]x*[t+n+m] + y[t+n]y*[t+n+m]) x[t+m]
+ x[t] sum_n C_ixpm(m=0,n) |y[t+n]|^2``.

One deliberate fix vs the reference: the ISPM phase term uses the *center*
symbol power |x[t]|^2 + |y[t]|^2 (the reference indexes the window corner
x[t-L], perturbation.py:329).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import quad
from scipy.special import comb, exp1, gammaincc

from opticommpy_tpu.ops.signal import pnorm
from opticommpy_tpu.utils.units import dbm2w

__all__ = [
    "PerturbationConfig",
    "calc_pert_coeff_matrix",
    "calc_nlin_perturbation",
    "calc_nlin_perturbation_simplified",
    "perturbation_nlin",
]


@dataclass(frozen=True)
class PerturbationConfig:
    """NLIN perturbation-model parameters (reference perturbation.py:65-79)."""

    D: float = 17.0  # [ps/nm/km]
    alpha: float = 0.2  # [dB/km]
    lspan: float = 50.0  # [km]
    length: float = 800.0  # [km]
    pulseWidth: float = 0.5  # fraction of symbol period
    gamma: float = 1.3  # [1/W/km]
    Fc: float = 193.2e12
    powerWeighted: bool = False
    Rs: float = 32e9
    powerWeightN: int = 10
    matrixOrder: int = 25
    mode: str = "AM"  # 'AM' | 'AMR' (coefficient-pruned)
    Pin: float = 0.0  # [dBm]
    coeffTol: float = -20.0  # [dB], AMR pruning threshold


def calc_pert_coeff_matrix(config: PerturbationConfig):
    """Perturbation coefficient matrices (reference perturbation.py:29).

    Returns (C, C_ifwm, C_ixpm, C_ispm) with the (2L+1, 2L+1) layout
    C[i, j] = C(m = j - L, n = L - i).
    """
    cfg = config
    c_kms = 299792458.0 / 1e3
    ts = 1 / cfg.Rs
    tau = cfg.pulseWidth * ts
    lam = c_kms / cfg.Fc
    alpha = cfg.alpha / (10 * np.log10(np.e))
    beta2 = -cfg.D * lam**2 / (2 * np.pi * c_kms)
    leff = (1 - np.exp(-alpha * cfg.lspan)) / alpha
    n_spans = int(cfg.length / cfg.lspan)
    L = cfg.matrixOrder

    m_vals = np.arange(-L, L + 1)
    M, N = np.meshgrid(m_vals, m_vals[::-1])  # M[i,j]=m, N[i,j]=n

    # ISPM: numerical integral of 1/sqrt(tau^4/(3 b2^2) + z^2)
    c_int = tau**4 / (3 * beta2**2)
    c_ispm, _ = quad(lambda z: 1.0 / np.sqrt(c_int + z**2), 0, cfg.length)

    if cfg.powerWeighted:
        a_coef = M * N * ts**2 / beta2
        norder = cfg.powerWeightN
        sum1 = np.zeros_like(M, dtype=complex)
        with np.errstate(divide="ignore", invalid="ignore"):
            for span in range(1, n_spans + 1):
                b_coef = -norder / (alpha * a_coef) + ((span - 1) * cfg.lspan) / a_coef
                sum2 = np.zeros_like(M, dtype=complex)
                for kk in range(1, norder + 1):
                    if span != 1:
                        g_prev = gammaincc(
                            1 - kk, 1j * (1 / b_coef - a_coef / ((span - 1) * cfg.lspan))
                        )
                    else:
                        g_prev = np.zeros_like(M, dtype=complex)
                    g_next = gammaincc(
                        1 - kk, 1j * (1 / b_coef - a_coef / (span * cfg.lspan))
                    )
                    sum2 = sum2 + (
                        (-1) ** (kk + norder)
                        * comb(norder - 1, kk - 1)
                        * (1j / b_coef) ** kk
                        * (g_prev - g_next)
                    )
                sum1 = sum1 + (np.exp(1j / b_coef) / b_coef ** (norder - 1)) * sum2
            c_ifwm = (norder / alpha) ** norder * (a_coef ** -norder) * sum1
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            c_ifwm = exp1(-1j * M * N * ts**2 / (beta2 * cfg.length))

    with np.errstate(divide="ignore", invalid="ignore"):
        c_ixpm = 0.5 * exp1(
            (N - M) ** 2 * ts**2 * tau**2 / (3 * np.abs(beta2) ** 2 * cfg.length**2)
        )

    # singular entries (m*n = 0 for IFWM, m = n for IXPM diagonal at 0)
    bad = ~np.isfinite(np.abs(c_ifwm))
    ifwm_mask = bad.astype(float)
    c_ifwm = np.where(bad, 0, c_ifwm)
    c_ixpm = np.where(~np.isfinite(np.abs(c_ixpm)), 0, c_ixpm)
    c_ixpm = ifwm_mask * c_ixpm  # IXPM defined only where IFWM was singular

    scale = 1j * (8 / 9) * cfg.gamma * tau**2 / (np.sqrt(3) * np.abs(beta2)) * leff / cfg.lspan
    if cfg.powerWeighted:
        c_ifwm = -(8 / 9) * cfg.gamma * tau**2 / (np.sqrt(3) * beta2) * c_ifwm
    else:
        c_ifwm = scale * c_ifwm
    c_ixpm = scale * c_ixpm
    c_ispm = scale * c_ispm

    C = c_ifwm + c_ixpm
    return (
        C.astype(np.complex64),
        c_ifwm.astype(np.complex64),
        c_ixpm.astype(np.complex64),
        np.complex64(c_ispm),
    )


@partial(jax.jit, static_argnames=("chunk",))
def _nlin_kernel(xw, yw, cf, cx1, cx2, c_ispm, chunk=512):
    """Chunked window contraction for the additive + phase NLIN terms.

    xw, yw : (N, 4L+1) sliding windows of the (zero-padded) symbols.
    cf : (2L+1, 2L+1) IFWM coefficients, cf[i, j] = C(m=j-L, n=L-i).
    cx1 : (2L+1,) IXPM coefficients at n=0 (indexed by j <-> m).
    cx2 : (2L+1,) IXPM coefficients at m=0 (indexed by i <-> n).
    """
    n_sym, w = xw.shape
    ind_l = cf.shape[0]
    L = (ind_l - 1) // 2

    # window positions (see module docstring): pos_m[j] = L+j, pos_n[i] = 3L-i,
    # pos_mn[i, j] = 2L + j - i
    pos_m = np.arange(ind_l) + L
    pos_n = 3 * L - np.arange(ind_l)
    pos_mn = 2 * L + np.arange(ind_l)[None, :] - np.arange(ind_l)[:, None]

    pm = jnp.asarray(pos_m)
    pn = jnp.asarray(pos_n)
    pmn = jnp.asarray(pos_mn)

    def block(tb):
        xb = jax.lax.dynamic_slice_in_dim(xw, tb, chunk, axis=0)  # (chunk, 4L+1)
        yb = jax.lax.dynamic_slice_in_dim(yw, tb, chunk, axis=0)
        xm = xb[:, pm]  # (chunk, indL)
        ym = yb[:, pm]
        xn = xb[:, pn]
        yn = yb[:, pn]
        x_mn = xb[:, pmn]  # (chunk, indL, indL)
        y_mn = yb[:, pmn]
        t1 = xn[:, :, None] * jnp.conj(x_mn) + yn[:, :, None] * jnp.conj(y_mn)
        s = jnp.einsum("ij,tij->tj", cf, t1)  # contract over n (rows)
        dx_b = jnp.sum(s * xm, axis=1)
        # dy: swap roles of x and y in the bilinear term (M2 + M1 identical)
        dy_b = jnp.sum(s * ym, axis=1)

        # IXPM additive term at m=0: x[t] * sum_n Cx2[n] |y[t+n]|^2
        ay_n = jnp.abs(yb[:, pn]) ** 2
        ax_n = jnp.abs(xb[:, pn]) ** 2
        x_c = xb[:, 2 * L]
        y_c = yb[:, 2 * L]
        dx_b = dx_b + x_c * (ay_n @ cx2)
        dy_b = dy_b + y_c * (ax_n @ cx2)

        # IXPM phase terms at n=0 + center-symbol ISPM
        ax_m = jnp.abs(xm) ** 2
        ay_m = jnp.abs(ym) ** 2
        p_c = jnp.abs(x_c) ** 2 + jnp.abs(y_c) ** 2
        phi_x = jnp.imag((2 * ax_m + ay_m) @ cx1 + p_c * c_ispm)
        phi_y = jnp.imag((2 * ay_m + ax_m) @ cx1 + p_c * c_ispm)
        return dx_b, dy_b, phi_x, phi_y

    n_blocks = n_sym // chunk
    starts = jnp.arange(n_blocks) * chunk
    dx, dy, phi_x, phi_y = jax.lax.map(block, starts)
    return (
        dx.reshape(-1),
        dy.reshape(-1),
        phi_x.reshape(-1),
        phi_y.reshape(-1),
    )


@jax.jit
def _nlin_kernel_fft(x, y, cf, cx1, cx2, c_ispm):
    """FFT formulation of the NLIN contraction — O(L N log N) not O(L^2 N).

    Identity: with lag products ``u_m[t] = x[t] x*[t+m] + y[t] y*[t+m]``,
    the IFWM double sum factors into per-column correlations

        dx[t] = sum_m ( sum_n C(m, n) u_m[t+n] ) x[t+m],

    i.e. indL FIR correlations of length indL over the lag-product signals —
    one batched FFT convolution — instead of the (chunk, indL, indL)
    triple-product tensor. ~9x fewer FLOPs at L=25 and the work lands in
    XLA's FFT instead of giant gathered windows. Matches `_nlin_kernel`
    to float32 accumulation order (tests pin 1e-5 relative).
    """
    n_sym = x.shape[0]
    ind_l = cf.shape[0]
    L = (ind_l - 1) // 2
    from opticommpy_tpu.kernels._util import sliding_windows

    xp = jnp.pad(x, (L, L))
    yp = jnp.pad(y, (L, L))
    # shifted copies xs[j, t] = x[t + j - L] as indL STATIC SLICES, not a
    # (indL, N) gather: XLA gathers run at ~0.6 GB/s on this TPU backend
    # (measured round 5: the two gathers were 90 of the 126 ms call) while
    # slices are pure streaming copies (~free)
    xs = sliding_windows(xp, n_sym, 1, ind_l, taps_first=True)
    ys = sliding_windows(yp, n_sym, 1, ind_l, taps_first=True)
    # lag products u_m[t] = x[t] x*[t+m] + y[t] y*[t+m], rows j <-> m = j-L
    u = x[None, :] * jnp.conj(xs) + y[None, :] * jnp.conj(ys)  # (indL, N)

    # correlation g_j[t] = sum_n k_j[n] u_j[t+n], k_j[n] = cf[L-n, j]
    # (n in [-L, L]) via zero-padded FFT convolution, batched over j.
    n_fft = int(2 ** np.ceil(np.log2(n_sym + 2 * ind_l)))
    # conv kernel: g = conv(u, h)[t + L] with h[i] = k_j[L - i] = cf[i, j]
    h = cf.T  # (indL kernels, indL taps), h_j[i] = cf[i, j]
    uf = jnp.fft.fft(u, n=n_fft, axis=1)
    hf = jnp.fft.fft(h.astype(u.dtype), n=n_fft, axis=1)
    g = jnp.fft.ifft(uf * hf, axis=1)[:, L:L + n_sym]  # (indL, N)

    dx = jnp.sum(g * xs, axis=0)
    dy = jnp.sum(g * ys, axis=0)

    # IXPM additive at m=0: x[t] * sum_i cx2[i] |y[t+L-i]|^2
    # = x[t] * conv(|y|^2, cx2)[t + L]
    ax = jnp.abs(xs) ** 2  # (indL, N): |x[t + j - L]|^2
    ay = jnp.abs(ys) ** 2
    # sum_i cx2[i] a[t + L - i]: the shifted stacks hold a[t + j - L] in row
    # j, so the row weight is cx2[2L - j] — cx2 reversed.
    w2 = cx2[::-1]
    dx = dx + x * jnp.tensordot(w2, ay, axes=1)
    dy = dy + y * jnp.tensordot(w2, ax, axes=1)

    # IXPM phase at n=0 (+ center ISPM): sum_j cx1[j] b[t + j - L]
    p_c = jnp.abs(x) ** 2 + jnp.abs(y) ** 2
    phi_x = jnp.imag(jnp.tensordot(cx1, 2 * ax + ay, axes=1) + p_c * c_ispm)
    phi_y = jnp.imag(jnp.tensordot(cx1, 2 * ay + ax, axes=1) + p_c * c_ispm)
    return dx, dy, phi_x, phi_y


def calc_nlin_perturbation(c_ifwm, c_ixpm, c_ispm, x, y, chunk=512,
                           method="fft"):
    """Additive/multiplicative NLIN waveforms (reference perturbation.py:200).

    ``method``: 'fft' (default — lag-product + batched FFT correlation form,
    O(L N log N)) or 'chunk' (the windowed triple-product tensor the
    reference's prange kernel maps to, O(L^2 N); kept as the oracle).
    Returns (dx, dy, phi_ixpm_x, phi_ixpm_y), each of length len(x).
    """
    if method == "fft":
        x = pnorm(jnp.asarray(x))
        y = pnorm(jnp.asarray(y))
        cf = jnp.asarray(c_ifwm)
        L = (np.asarray(c_ifwm).shape[0] - 1) // 2
        cx1 = jnp.asarray(np.asarray(c_ixpm)[L, :])
        cx2 = jnp.asarray(np.asarray(c_ixpm)[:, L])
        return _nlin_kernel_fft(x.astype(jnp.complex64),
                                y.astype(jnp.complex64), cf, cx1, cx2,
                                jnp.asarray(c_ispm))
    x = pnorm(jnp.asarray(x))
    y = pnorm(jnp.asarray(y))
    n_sym = x.shape[0]
    ind_l = c_ifwm.shape[0]
    L = (ind_l - 1) // 2
    d = 2 * L

    cf = jnp.asarray(c_ifwm)
    cx1 = jnp.asarray(np.asarray(c_ixpm)[L, :])  # n=0 row, indexed by m
    cx2 = jnp.asarray(np.asarray(c_ixpm)[:, L])  # m=0 column, indexed by n

    # pad and build sliding windows of width 4L+1 as static slices (see
    # _nlin_kernel_fft: gathers are ~0.6 GB/s on this backend)
    from opticommpy_tpu.kernels._util import sliding_windows

    n_pad = int(np.ceil(n_sym / chunk)) * chunk
    xp = jnp.pad(x.astype(jnp.complex64), (d, d + (n_pad - n_sym)))
    yp = jnp.pad(y.astype(jnp.complex64), (d, d + (n_pad - n_sym)))
    xw = sliding_windows(xp, n_pad, 1, 2 * d + 1)
    yw = sliding_windows(yp, n_pad, 1, 2 * d + 1)

    dx, dy, phi_x, phi_y = _nlin_kernel(
        xw, yw, cf, cx1, cx2, jnp.asarray(c_ispm), chunk
    )
    return dx[:n_sym], dy[:n_sym], phi_x[:n_sym], phi_y[:n_sym]


@partial(jax.jit, static_argnames=("chunk",))
def _nlin_kernel_pruned(xw, yw, cf_sel, cx1, cx2, c_ispm, i_sel, j_sel, chunk=512):
    """Coefficient-pruned contraction: only the top-|C| (i, j) pairs are kept.

    Same math as :func:`_nlin_kernel` but the (2L+1)^2 grid is replaced by P
    selected coefficient positions (reference perturbation.py:342, 'AMR').
    """
    n_sym, w = xw.shape
    L = (w - 1) // 4

    pos_n_sel = 3 * L - i_sel
    pos_m_sel = L + j_sel
    pos_mn_sel = 2 * L + j_sel - i_sel
    ind_l = 2 * L + 1
    pm = jnp.asarray(np.arange(ind_l) + L)
    pn = jnp.asarray(3 * L - np.arange(ind_l))

    def block(tb):
        xb = jax.lax.dynamic_slice_in_dim(xw, tb, chunk, axis=0)
        yb = jax.lax.dynamic_slice_in_dim(yw, tb, chunk, axis=0)
        xn_s = xb[:, pos_n_sel]
        yn_s = yb[:, pos_n_sel]
        xm_s = xb[:, pos_m_sel]
        ym_s = yb[:, pos_m_sel]
        xmn_s = xb[:, pos_mn_sel]
        ymn_s = yb[:, pos_mn_sel]
        t1 = xn_s * jnp.conj(xmn_s) + yn_s * jnp.conj(ymn_s)  # (chunk, P)
        dx_b = (t1 * xm_s) @ cf_sel
        dy_b = (t1 * ym_s) @ cf_sel

        x_c = xb[:, 2 * L]
        y_c = yb[:, 2 * L]
        ay_n = jnp.abs(yb[:, pn]) ** 2
        ax_n = jnp.abs(xb[:, pn]) ** 2
        dx_b = dx_b + x_c * (ay_n @ cx2)
        dy_b = dy_b + y_c * (ax_n @ cx2)

        ax_m = jnp.abs(xb[:, pm]) ** 2
        ay_m = jnp.abs(yb[:, pm]) ** 2
        p_c = jnp.abs(x_c) ** 2 + jnp.abs(y_c) ** 2
        phi_x = jnp.imag((2 * ax_m + ay_m) @ cx1 + p_c * c_ispm)
        phi_y = jnp.imag((2 * ay_m + ax_m) @ cx1 + p_c * c_ispm)
        return dx_b, dy_b, phi_x, phi_y

    starts = jnp.arange(n_sym // chunk) * chunk
    dx, dy, phi_x, phi_y = jax.lax.map(block, starts)
    return dx.reshape(-1), dy.reshape(-1), phi_x.reshape(-1), phi_y.reshape(-1)


def calc_nlin_perturbation_simplified(c_ifwm, c_ixpm, c_ispm, x, y,
                                      coeff_tol=-20.0, chunk=512):
    """Pruned NLIN computation (reference perturbation.py:342).

    Drops IFWM coefficients more than |coeff_tol| dB below the largest one.
    Returns (dx, dy, phi_x, phi_y, n_kept, reduction_percent).
    """
    x = pnorm(jnp.asarray(x))
    y = pnorm(jnp.asarray(y))
    n_sym = x.shape[0]
    c_ifwm = np.asarray(c_ifwm)
    c_ixpm = np.asarray(c_ixpm)
    L = (c_ifwm.shape[0] - 1) // 2
    d = 2 * L

    C = c_ifwm + c_ixpm
    C[L, L] = c_ispm
    abs_c = np.abs(C)
    keep = 20 * np.log10(np.maximum(abs_c, 1e-300) / abs_c.max()) > coeff_tol
    i_sel, j_sel = np.nonzero(keep)
    cf_sel = jnp.asarray(c_ifwm[i_sel, j_sel])
    n_kept = int(i_sel.size)
    reduction = round(100 * (1 - n_kept / C.size), 2)

    cx1 = jnp.asarray(c_ixpm[L, :])
    cx2 = jnp.asarray(c_ixpm[:, L])

    from opticommpy_tpu.kernels._util import sliding_windows

    n_pad = int(np.ceil(n_sym / chunk)) * chunk
    xp = jnp.pad(x.astype(jnp.complex64), (d, d + (n_pad - n_sym)))
    yp = jnp.pad(y.astype(jnp.complex64), (d, d + (n_pad - n_sym)))
    xw = sliding_windows(xp, n_pad, 1, 2 * d + 1)
    yw = sliding_windows(yp, n_pad, 1, 2 * d + 1)

    dx, dy, phi_x, phi_y = _nlin_kernel_pruned(
        xw, yw, cf_sel, cx1, cx2, jnp.asarray(c_ispm),
        jnp.asarray(i_sel), jnp.asarray(j_sel), chunk,
    )
    return (dx[:n_sym], dy[:n_sym], phi_x[:n_sym], phi_y[:n_sym],
            n_kept, reduction)


def perturbation_nlin(e_in, config: PerturbationConfig = PerturbationConfig()):
    """Intrachannel NLIN via the first-order perturbation model.

    Parity with reference perturbationNLIN (perturbation.py:505): normalizes
    each polarization, computes the additive (dx, dy) and multiplicative
    (phi) terms, and assembles
    ``nlin = sqrt(P) E (exp(j phi) - 1) + delta exp(j phi)`` with
    ``delta = P^{3/2} d`` and peak power P = launch/2.
    """
    cfg = config
    e_in = jnp.asarray(e_in)
    x = pnorm(e_in[:, 0])
    y = pnorm(e_in[:, 1])

    _, c_ifwm, c_ixpm, c_ispm = calc_pert_coeff_matrix(cfg)
    if cfg.mode == "AMR":
        dx, dy, phi_x, phi_y, _, _ = calc_nlin_perturbation_simplified(
            c_ifwm, c_ixpm, c_ispm, x, y, cfg.coeffTol
        )
    else:
        dx, dy, phi_x, phi_y = calc_nlin_perturbation(c_ifwm, c_ixpm, c_ispm, x, y)

    p_peak = 0.5 * float(dbm2w(cfg.Pin))
    delta_x = p_peak**1.5 * dx
    delta_y = p_peak**1.5 * dy
    phi_x = p_peak * phi_x
    phi_y = p_peak * phi_y

    nlin_x = jnp.sqrt(p_peak) * x * (jnp.exp(1j * phi_x) - 1) + delta_x * jnp.exp(
        1j * phi_x
    )
    nlin_y = jnp.sqrt(p_peak) * y * (jnp.exp(1j * phi_y) - 1) + delta_y * jnp.exp(
        1j * phi_y
    )
    return jnp.stack([nlin_x, nlin_y], axis=1)
