"""Tests for whitening-filter estimation (autocorr + Levinson-Durbin)."""

import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.ops import autocorr, estimate_whitening_filter, levinson


def test_autocorr_white_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=100_000).astype(np.float32))
    r = np.asarray(autocorr(x, 4))
    assert np.isclose(r[0], 1.0, rtol=0.02)
    assert np.all(np.abs(r[1:]) < 0.02)


def test_levinson_solves_toeplitz_system():
    # AR(2) process: x[n] = a1 x[n-1] + a2 x[n-2] + w[n]
    rng = np.random.default_rng(1)
    a1, a2 = 0.6, -0.2
    n = 200_000
    w = rng.normal(size=n)
    x = np.zeros(n)
    for k in range(2, n):
        x[k] = a1 * x[k - 1] + a2 * x[k - 2] + w[k]
    coeffs = np.asarray(estimate_whitening_filter(jnp.asarray(x.astype(np.float32)), 3))
    # whitening filter [1, -a1, -a2]
    assert np.isclose(coeffs[0], 1.0)
    assert np.isclose(coeffs[1], -a1, atol=0.02)
    assert np.isclose(coeffs[2], -a2, atol=0.02)


def test_whitening_filter_whitens():
    rng = np.random.default_rng(2)
    n = 100_000
    w = rng.normal(size=n)
    # colored noise via moving average
    x = np.convolve(w, [1.0, 0.7, 0.3], mode="same")
    coeffs = np.asarray(estimate_whitening_filter(jnp.asarray(x.astype(np.float32)), 8))
    y = np.convolve(x, coeffs, mode="same")
    r_x = np.asarray(autocorr(jnp.asarray(x.astype(np.float32)), 3))
    r_y = np.asarray(autocorr(jnp.asarray(y.astype(np.float32)), 3))
    # lag-1 correlation reduced substantially
    assert abs(r_y[1] / r_y[0]) < 0.3 * abs(r_x[1] / r_x[0])
