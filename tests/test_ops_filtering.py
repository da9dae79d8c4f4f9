"""Tests for filtering primitives — property style after reference tests/test_dsp.py."""

import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.ops import (
    fir_filter,
    lowpass_fir,
    overlap_save,
    pulse_shape,
    rrc_taps,
)


def _np_conv_same(x, h):
    return np.convolve(x, h, mode="full")[(len(h) - 1) // 2:][: len(x)]


def test_fir_filter_matches_direct_convolution():
    rng = np.random.default_rng(0)
    x = rng.normal(size=500) + 1j * rng.normal(size=500)
    h = rng.normal(size=31)
    y = np.asarray(fir_filter(jnp.asarray(h), jnp.asarray(x)))
    ref = _np_conv_same(x, h)
    assert np.allclose(y, ref, atol=1e-3)


def test_fir_filter_2d_modes_and_real_dtype():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 2)).astype(np.float32)
    h = np.ones(5) / 5
    y = np.asarray(fir_filter(jnp.asarray(h), jnp.asarray(x)))
    assert y.shape == (300, 2)
    assert not np.iscomplexobj(y)
    for k in range(2):
        assert np.allclose(y[:, k], _np_conv_same(x[:, k], h), atol=1e-4)


def test_overlap_save_equals_fir_filter():
    rng = np.random.default_rng(2)
    x = rng.normal(size=2000) + 1j * rng.normal(size=2000)
    h = rng.normal(size=64)
    y_blk = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h), nfft=256))
    y_ref = _np_conv_same(x, h)
    assert np.allclose(y_blk, y_ref, atol=1e-3)


def test_overlap_save_real_input_returns_real():
    rng = np.random.default_rng(3)
    x = rng.normal(size=777)
    h = np.ones(9) / 9
    y = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h), nfft=128))
    assert not np.iscomplexobj(y)
    assert np.allclose(y, _np_conv_same(x, h), atol=1e-4)


def test_rrc_nyquist_zero_isi():
    # RRC * RRC = RC should satisfy the Nyquist zero-ISI criterion
    # (reference tests/test_dsp.py:137-155)
    sps = 8
    n_taps = 1024
    p = pulse_shape("rrc", sps=sps, n_taps=n_taps, rolloff=0.1)
    rc = np.convolve(p, p, mode="full")
    center = len(rc) // 2
    rc = rc / rc[center]
    samples = rc[center % sps::sps]
    peak_idx = np.argmax(np.abs(samples))
    others = np.delete(samples, peak_idx)
    assert np.all(np.abs(others) < 5e-3)


def test_rrc_taps_singularity_points_finite():
    alpha = 0.25
    t = np.array([0.0, 1 / (4 * alpha), -1 / (4 * alpha), 0.5])
    taps = rrc_taps(t, alpha, 1.0)
    assert np.all(np.isfinite(taps))
    assert np.isclose(taps[0], 1 + alpha * (4 / np.pi - 1))


def test_lowpass_fir_dc_gain_and_cutoff():
    h = lowpass_fir(0.1, 1.0, 301)
    assert np.isclose(np.sum(h), 1.0)
    w = np.fft.rfftfreq(4096)
    H = np.abs(np.fft.rfft(h, 4096))
    assert np.all(H[w < 0.05] > 0.9)
    assert np.all(H[w > 0.2] < 0.05)


def test_pulse_shape_normalization():
    for typ in ["rect", "nrz", "rrc", "rc", "duobinary"]:
        p = pulse_shape(typ, sps=4, n_taps=257, rolloff=0.2)
        assert np.isclose(np.sum(p), 1.0), typ
