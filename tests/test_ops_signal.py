"""Tests for signal primitives — property style after reference tests/test_dsp.py."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.ops import (
    clock_sampling_interp,
    decimate,
    delay_signal,
    finddelay,
    freq_shift,
    gaussian_complex_noise,
    moving_average,
    phase_noise,
    pnorm,
    quantizer,
    resample,
    sig_pow,
    signal_power,
    symbol_sync,
    upsample,
)


def test_pnorm_unit_power():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000, 2)) + 1j * rng.normal(size=(1000, 2)))
    y = pnorm(3.7 * x)
    assert np.isclose(float(sig_pow(y)), 1.0, rtol=1e-5)


def test_signal_power_sums_modes():
    x = jnp.ones((100, 2), dtype=jnp.complex64)
    assert np.isclose(float(signal_power(x)), 2.0)


def test_upsample_inserts_zeros():
    x = jnp.arange(1, 5).astype(jnp.float32)
    y = np.asarray(upsample(x, 3))
    assert len(y) == 12
    assert np.array_equal(y[::3], np.arange(1, 5))
    assert np.all(y[1::3] == 0) and np.all(y[2::3] == 0)


def test_quantizer_levels_and_error_bound():
    # reference tests/test_dsp.py:195-210
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, size=(5000, 1)).astype(np.float32))
    n_bits = 4
    y = np.asarray(quantizer(x, n_bits, 1.0, -1.0))
    levels = np.unique(y)
    assert len(levels) <= 2**n_bits
    delta = 2.0 / (2**n_bits - 1)
    assert np.max(np.abs(y - np.asarray(x))) <= delta / 2 + 1e-6


def test_freq_shift_roundtrip():
    # reference tests/test_dsp.py:247-254
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=600) + 1j * rng.normal(size=600))
    fs, df = 10.0, 1.3
    y = freq_shift(freq_shift(x, df, fs), -df, fs)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_finddelay_recovers_known_shift():
    rng = np.random.default_rng(3)
    x = rng.normal(size=512)
    for d in [0, 5, 37]:
        y = np.roll(x, d)
        est = int(finddelay(jnp.asarray(y), jnp.asarray(x)))
        assert est == d


def test_delay_signal_integer_delay_is_shift():
    rng = np.random.default_rng(4)
    x = rng.normal(size=256)
    fs = 1.0
    y = np.asarray(delay_signal(jnp.asarray(x), 3.0, fs))
    assert np.allclose(y[3:250], x[: 247], atol=1e-6)


def test_clock_sampling_interp_identity_and_ratio():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(400, 1)))
    y = clock_sampling_interp(x, 2.0, 2.0)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-7)
    y2 = clock_sampling_interp(x, 2.0, 4.0)
    assert y2.shape[0] == 800


def test_resample_bandlimited_roundtrip():
    # downsample then upsample a bandlimited signal
    n = 2048
    t = np.arange(n)
    x = np.cos(2 * np.pi * 0.01 * t) + 0.5 * np.sin(2 * np.pi * 0.02 * t)
    x = jnp.asarray(x)
    y = resample(x, 4.0, 2.0)
    z = resample(y, 2.0, 4.0)
    n_min = min(len(z), n)
    sl = slice(300, n_min - 300)
    assert np.allclose(np.asarray(z)[sl], np.asarray(x)[sl], atol=5e-2)


def test_decimate_picks_peak_phase():
    # build a 4-SpS pulse train where phase 2 has max variance
    sps = 4
    n_sym = 200
    rng = np.random.default_rng(6)
    symbols = rng.choice([-1.0, 1.0], size=n_sym)
    x = np.zeros(n_sym * sps)
    x[2::sps] = symbols
    y = np.asarray(decimate(jnp.asarray(x[:, None]), sps, 1))[:, 0]
    assert np.allclose(np.abs(y[: n_sym - 1]), 1.0)


def test_moving_average_constant_signal():
    x = jnp.ones((100, 1))
    y = np.asarray(moving_average(x, 5))
    assert y.shape == (100, 1)
    assert np.allclose(y[2:-2], 1.0)


def test_phase_noise_increment_variance():
    # reference tests/test_dsp.py:309-315
    key = jax.random.PRNGKey(0)
    lw, ts, n = 1e5, 1e-9, 200_000
    phi = np.asarray(phase_noise(key, lw, n, ts))
    incr = np.diff(phi)
    assert np.isclose(np.var(incr), 2 * np.pi * lw * ts, rtol=0.05)


def test_gaussian_complex_noise_variance_and_determinism():
    key = jax.random.PRNGKey(42)
    n1 = np.asarray(gaussian_complex_noise(key, (100_000,), var=2.5))
    n2 = np.asarray(gaussian_complex_noise(key, (100_000,), var=2.5))
    assert np.array_equal(n1, n2)  # same key -> same draw
    assert np.isclose(np.mean(np.abs(n1) ** 2), 2.5, rtol=0.05)


def test_symbol_sync_recovers_delay_and_swap():
    rng = np.random.default_rng(7)
    # 16-QAM (amplitude correlation needs a non-constant-modulus constellation)
    levels = np.array([-3.0, -1.0, 1.0, 3.0])
    const = (levels[:, None] + 1j * levels[None, :]).ravel() / np.sqrt(10)
    tx = const[rng.integers(0, 16, size=(1000, 2))]
    # received = swapped modes, delayed by 17 symbols
    rx = np.roll(tx[:, ::-1], 17, axis=0).astype(np.complex64)
    tx_sync = np.asarray(symbol_sync(jnp.asarray(rx), jnp.asarray(tx), sps=1))
    # after sync, tx_sync should match rx (up to edge effects from roll)
    match = np.mean(np.abs(tx_sync[20:-20] - rx[20:-20]) < 1e-3)
    assert match > 0.99
