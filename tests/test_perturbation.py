"""Tests for the first-order NLIN perturbation model.

Validated against a direct NumPy transcription of the derived index formula
(dx[t] = sum_{m,n} C[n,m] (x[t+n]x*[t+n+m] + y[t+n]y*[t+n+m]) x[t+m] + ...),
plus structural properties. The reference ships no perturbation tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.models.perturbation import (
    PerturbationConfig,
    calc_nlin_perturbation,
    calc_nlin_perturbation_simplified,
    calc_pert_coeff_matrix,
    perturbation_nlin,
)


def _direct_numpy_nlin(c_ifwm, c_ixpm, c_ispm, x, y):
    """O(N L^2) literal implementation of the model for verification."""
    x = np.asarray(x) / np.sqrt(np.mean(np.abs(x) ** 2))
    y = np.asarray(y) / np.sqrt(np.mean(np.abs(y) ** 2))
    n_sym = len(x)
    L = (c_ifwm.shape[0] - 1) // 2
    d = 2 * L
    xp = np.concatenate([np.zeros(d, complex), x, np.zeros(d, complex)])
    yp = np.concatenate([np.zeros(d, complex), y, np.zeros(d, complex)])
    dx = np.zeros(n_sym, complex)
    dy = np.zeros(n_sym, complex)
    phi_x = np.zeros(n_sym)
    phi_y = np.zeros(n_sym)
    ms = np.arange(-L, L + 1)
    for t in range(n_sym):
        tc = t + d
        acc_x = 0j
        acc_y = 0j
        for i, n in enumerate(L - np.arange(2 * L + 1)):
            for j, m in enumerate(ms):
                c = c_ifwm[i, j]
                if c == 0:
                    continue
                t1 = (
                    xp[tc + n] * np.conj(xp[tc + n + m])
                    + yp[tc + n] * np.conj(yp[tc + n + m])
                )
                acc_x += c * t1 * xp[tc + m]
                acc_y += c * t1 * yp[tc + m]
        # IXPM additive at m=0
        for i, n in enumerate(L - np.arange(2 * L + 1)):
            c = c_ixpm[i, L]
            acc_x += c * xp[tc] * np.abs(yp[tc + n]) ** 2
            acc_y += c * yp[tc] * np.abs(xp[tc + n]) ** 2
        dx[t] = acc_x
        dy[t] = acc_y
        # IXPM phase at n=0 + center ISPM
        sx = 0j
        sy = 0j
        for j, m in enumerate(ms):
            c = c_ixpm[L, j]
            sx += c * (2 * np.abs(xp[tc + m]) ** 2 + np.abs(yp[tc + m]) ** 2)
            sy += c * (2 * np.abs(yp[tc + m]) ** 2 + np.abs(xp[tc + m]) ** 2)
        pc = np.abs(xp[tc]) ** 2 + np.abs(yp[tc]) ** 2
        phi_x[t] = np.imag(sx + pc * c_ispm)
        phi_y[t] = np.imag(sy + pc * c_ispm)
    return dx, dy, phi_x, phi_y


def test_coeff_matrix_structure():
    cfg = PerturbationConfig(matrixOrder=8)
    C, c_ifwm, c_ixpm, c_ispm = calc_pert_coeff_matrix(cfg)
    L = 8
    assert C.shape == (17, 17)
    assert np.all(np.isfinite(C))
    # IFWM is zero where m*n == 0 (singular rows/cols), IXPM nonzero there
    assert np.all(c_ifwm[L, :] == 0)  # n = 0 row
    assert np.all(c_ifwm[:, L] == 0)  # m = 0 column
    assert np.abs(c_ixpm[L, L - 2]) > 0
    assert np.imag(c_ispm) > 0  # phase-rotation coefficient


def test_kernel_matches_direct_numpy():
    cfg = PerturbationConfig(matrixOrder=4)
    _, c_ifwm, c_ixpm, c_ispm = calc_pert_coeff_matrix(cfg)
    rng = np.random.default_rng(0)
    n = 64
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2)
    y = (rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2)
    dx, dy, phx, phy = calc_nlin_perturbation(
        c_ifwm, c_ixpm, complex(c_ispm), jnp.asarray(x), jnp.asarray(y), chunk=32
    )
    dx_r, dy_r, phx_r, phy_r = _direct_numpy_nlin(
        c_ifwm, c_ixpm, complex(c_ispm), x, y
    )
    assert np.allclose(np.asarray(dx), dx_r, atol=2e-5)
    assert np.allclose(np.asarray(dy), dy_r, atol=2e-5)
    assert np.allclose(np.asarray(phx), phx_r, atol=2e-5)
    assert np.allclose(np.asarray(phy), phy_r, atol=2e-5)


def test_pruned_kernel_approximates_full():
    cfg = PerturbationConfig(matrixOrder=6)
    _, c_ifwm, c_ixpm, c_ispm = calc_pert_coeff_matrix(cfg)
    rng = np.random.default_rng(1)
    n = 128
    x = jnp.asarray((rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2))
    y = jnp.asarray((rng.normal(size=n) + 1j * rng.normal(size=n)) / np.sqrt(2))
    dx_f, dy_f, _, _ = calc_nlin_perturbation(c_ifwm, c_ixpm, complex(c_ispm),
                                              x, y, chunk=64)
    dx_p, dy_p, _, _, n_kept, red = calc_nlin_perturbation_simplified(
        c_ifwm, c_ixpm, complex(c_ispm), x, y, coeff_tol=-40, chunk=64
    )
    assert 0 < n_kept <= 13 * 13
    # loose tolerance: pruning drops small terms
    rel = np.linalg.norm(np.asarray(dx_p) - np.asarray(dx_f)) / np.linalg.norm(
        np.asarray(dx_f)
    )
    assert rel < 0.2


def test_perturbation_nlin_scales_with_power():
    cfg_lo = PerturbationConfig(matrixOrder=6, Pin=-3.0)
    cfg_hi = PerturbationConfig(matrixOrder=6, Pin=3.0)
    rng = np.random.default_rng(2)
    n = 256
    e = (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))) / np.sqrt(2)
    nlin_lo = np.asarray(perturbation_nlin(jnp.asarray(e), cfg_lo))
    nlin_hi = np.asarray(perturbation_nlin(jnp.asarray(e), cfg_hi))
    p_lo = np.mean(np.abs(nlin_lo) ** 2)
    p_hi = np.mean(np.abs(nlin_hi) ** 2)
    # additive NLIN power grows ~P^3: +6 dB launch -> ~+18 dB NLIN
    assert 10 * np.log10(p_hi / p_lo) > 12.0


def test_fft_method_matches_chunk_oracle():
    """FFT lag-product form == windowed triple-product form (r2 speedup)."""
    rng = np.random.default_rng(5)
    N = 4096
    x = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    y = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    _, cifwm, cixpm, cispm = calc_pert_coeff_matrix(
        PerturbationConfig(matrixOrder=15))
    a = calc_nlin_perturbation(cifwm, cixpm, cispm, x, y, method="chunk")
    b = calc_nlin_perturbation(cifwm, cixpm, cispm, x, y, method="fft")
    for u, v in zip(a, b):
        u, v = np.asarray(u), np.asarray(v)
        scale = np.max(np.abs(u)) + 1e-30
        assert np.max(np.abs(u - v)) / scale < 1e-5
