"""Tests for fiber channels — property style after reference tests/test_channels.py."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.models import (
    AWGNConfig,
    LinearFiberConfig,
    SSFMConfig,
    awgn,
    linear_fiber_channel,
    manakov_ssf,
    ssfm,
)
from opticommpy_tpu.ops import sig_pow


def _random_field(key, n, modes=1):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (n, modes)) + 1j * jax.random.normal(k2, (n, modes))
    return (x / np.sqrt(2)).astype(jnp.complex64)


def _bandlimited_field(n, modes=2, seed=0, sps=8):
    """Random symbols shaped to ~Rs/2 bandwidth (SSFM needs oversampling)."""
    rng = np.random.default_rng(seed)
    n_sym = n // sps
    s = rng.choice([-1 - 1j, -1 + 1j, 1 - 1j, 1 + 1j], size=(n_sym, modes))
    up = np.zeros((n, modes), dtype=complex)
    up[::sps] = s
    h = np.sinc(np.arange(-4 * sps, 4 * sps + 1) / sps)
    out = np.stack([np.convolve(up[:, k], h, "same") for k in range(modes)], axis=1)
    return jnp.asarray(out.astype(np.complex64))


def test_awgn_snr_calibration():
    # reference tests/test_channels.py:34-44: output SNR within 0.1 dB
    key = jax.random.PRNGKey(0)
    sig = _random_field(jax.random.PRNGKey(1), 200_000)
    snr_db = 15.0
    out = awgn(sig, key, AWGNConfig(snr=snr_db, Fs=1, B=1))
    noise = out - sig
    snr_est = 10 * np.log10(float(sig_pow(sig)) / float(sig_pow(noise)))
    assert abs(snr_est - snr_db) < 0.1


def test_awgn_deterministic_with_key():
    key = jax.random.PRNGKey(2)
    sig = _random_field(jax.random.PRNGKey(3), 1000)
    o1 = awgn(sig, key, AWGNConfig(snr=20))
    o2 = awgn(sig, key, AWGNConfig(snr=20))
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_linear_fiber_lossless_dispersion_preserves_power():
    sig = _bandlimited_field(2**14, modes=1)
    cfg = LinearFiberConfig(L=100, alpha=0.0, D=17, Fs=32e9 * 8)
    out = linear_fiber_channel(sig, cfg)
    assert np.isclose(float(sig_pow(out)), float(sig_pow(sig)), rtol=1e-5)


def test_linear_fiber_attenuation():
    sig = _bandlimited_field(2**12, modes=1)
    cfg = LinearFiberConfig(L=50, alpha=0.2, D=0, Fs=32e9 * 8)
    out = linear_fiber_channel(sig, cfg)
    # 10 dB total loss
    att_db = 10 * np.log10(float(sig_pow(sig)) / float(sig_pow(out)))
    assert np.isclose(att_db, 10.0, atol=1e-3)


def test_ssfm_gamma_zero_equals_linear_channel():
    # reference tests/test_channels.py:155-180 (atol relaxed for complex64)
    fs = 32e9 * 8
    sig = _bandlimited_field(2**13, modes=1)
    cfg = SSFMConfig(Ltotal=80, Lspan=80, hz=1.0, alpha=0.2, D=16, gamma=0.0,
                     Fs=fs, amp="none")
    out_ssfm = ssfm(sig[:, 0], cfg)
    lin_cfg = LinearFiberConfig(L=80, alpha=0.2, D=16, Fs=fs)
    out_lin = linear_fiber_channel(sig[:, 0], lin_cfg)
    err = np.max(np.abs(np.asarray(out_ssfm) - np.asarray(out_lin)))
    scale = np.max(np.abs(np.asarray(out_lin)))
    assert err / scale < 1e-4


def test_ssfm_power_preserving_lossless():
    # reference tests/test_channels.py:206-224
    fs = 32e9 * 8
    sig = _bandlimited_field(2**13, modes=1)
    cfg = SSFMConfig(Ltotal=40, Lspan=40, hz=0.5, alpha=0.0, D=16, gamma=1.3,
                     Fs=fs, amp="none")
    out = ssfm(0.01 * sig[:, 0], cfg)
    assert np.isclose(float(sig_pow(out)), float(sig_pow(0.01 * sig[:, 0])),
                      rtol=1e-4)


def test_manakov_gamma_zero_equals_linear_channel():
    fs = 32e9 * 8
    sig = _bandlimited_field(2**13, modes=2)
    cfg = SSFMConfig(Ltotal=80, Lspan=80, hz=1.0, alpha=0.2, D=16, gamma=0.0,
                     Fs=fs, amp="none", nlprMethod=False)
    out = manakov_ssf(sig, cfg)
    lin = linear_fiber_channel(sig, LinearFiberConfig(L=80, alpha=0.2, D=16, Fs=fs))
    err = np.max(np.abs(np.asarray(out) - np.asarray(lin)))
    scale = np.max(np.abs(np.asarray(lin)))
    assert err / scale < 1e-4


def test_manakov_power_preserving_lossless_nonlinear():
    fs = 32e9 * 8
    sig = 0.03 * _bandlimited_field(2**13, modes=2)
    cfg = SSFMConfig(Ltotal=40, Lspan=40, alpha=0.0, D=16, gamma=1.3, Fs=fs,
                     amp="none", nlprMethod=True)
    out = manakov_ssf(sig, cfg)
    assert np.isclose(float(sig_pow(out)), float(sig_pow(sig)), rtol=1e-4)


def test_manakov_ideal_amp_restores_power():
    fs = 32e9 * 8
    sig = 0.03 * _bandlimited_field(2**13, modes=2)
    cfg = SSFMConfig(Ltotal=100, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                     amp="ideal", nlprMethod=True)
    out = manakov_ssf(sig, cfg)
    assert np.isclose(float(sig_pow(out)), float(sig_pow(sig)), rtol=1e-3)


def test_manakov_save_all_spans_shapes():
    fs = 32e9 * 4
    sig = 0.03 * _bandlimited_field(2**11, modes=2, sps=4)
    cfg = SSFMConfig(Ltotal=150, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                     amp="ideal", nlprMethod=True)
    out, spans = manakov_ssf(sig, cfg, save_all_spans=True)
    assert spans.shape == (3, sig.shape[0], 2)
    assert np.allclose(np.asarray(spans[-1]), np.asarray(out))


def test_manakov_adaptive_vs_fixed_step_agree():
    fs = 32e9 * 8
    sig = 0.02 * _bandlimited_field(2**12, modes=2)
    base = dict(Ltotal=50, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs, amp="none")
    out_adaptive = manakov_ssf(sig, SSFMConfig(nlprMethod=True,
                                               maxNlinPhaseRot=5e-4, **base))
    out_fixed = manakov_ssf(sig, SSFMConfig(nlprMethod=False, hz=0.1, **base))
    err = np.max(np.abs(np.asarray(out_adaptive) - np.asarray(out_fixed)))
    scale = np.max(np.abs(np.asarray(out_fixed)))
    assert err / scale < 1e-3


def test_manakov_fused_linear_matches_unfused():
    fs = 32e9 * 8
    sig = 0.02 * _bandlimited_field(2**12, modes=2)
    base = dict(Ltotal=100, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                amp="none", nlprMethod=False, hz=0.1, trapIters=1)
    out_ref = manakov_ssf(sig, SSFMConfig(**base))
    out_fused = manakov_ssf(sig, SSFMConfig(fusedLinear=True, **base))
    err = np.max(np.abs(np.asarray(out_fused) - np.asarray(out_ref)))
    scale = np.max(np.abs(np.asarray(out_ref)))
    # same O(h^2) scheme, different nonlinear anchor -> agree to O(h^2)
    assert err / scale < 2e-3


def test_manakov_fused_linear_gamma_zero_exact():
    fs = 32e9 * 8
    sig = _bandlimited_field(2**12, modes=2)
    cfg = SSFMConfig(Ltotal=80, Lspan=80, hz=1.0, alpha=0.2, D=16, gamma=0.0,
                     Fs=fs, amp="none", nlprMethod=False, trapIters=1,
                     fusedLinear=True)
    out = manakov_ssf(sig, cfg)
    lin = linear_fiber_channel(sig, LinearFiberConfig(L=80, alpha=0.2, D=16, Fs=fs))
    err = np.max(np.abs(np.asarray(out) - np.asarray(lin)))
    assert err / np.max(np.abs(np.asarray(lin))) < 1e-4
