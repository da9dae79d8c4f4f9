"""Tests for optoelectronic device models."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.models import (
    EDFAConfig,
    LaserConfig,
    MZMConfig,
    PhotodiodeConfig,
    adc,
    basic_laser_model,
    coherent_receiver,
    edfa,
    iqm,
    mzm,
    optical_hybrid_2x4,
    pbs,
    pdm_coherent_receiver,
    photodiode,
    pm,
    voa,
)
from opticommpy_tpu.models.config import ADCConfig, CoherentFrontendConfig, PDMFrontendConfig
from opticommpy_tpu.ops import sig_pow
from opticommpy_tpu.utils import dbm2w


def test_pm_unit_magnitude_phase():
    u = jnp.linspace(-1.8, 1.8, 100)
    out = np.asarray(pm(jnp.ones(100, dtype=jnp.complex64), u, 2.0))
    assert np.allclose(np.abs(out), 1.0, atol=1e-6)
    assert np.allclose(np.angle(out), np.pi * np.asarray(u) / 2.0, atol=1e-5)


def test_mzm_null_and_peak_transmission():
    cfg = MZMConfig(Vpi=2.0, Vb=0.0, ER=300.0)
    # u + Vb = Vpi -> null; u + Vb = 0 -> peak
    out_null = np.abs(np.asarray(mzm(1.0 + 0j, jnp.array([2.0]), cfg)))
    out_peak = np.abs(np.asarray(mzm(1.0 + 0j, jnp.array([0.0]), cfg)))
    assert out_null[0] < 1e-4
    assert np.isclose(out_peak[0], 1.0, atol=1e-5)


def test_mzm_extinction_ratio_finite():
    cfg = MZMConfig(Vpi=2.0, Vb=0.0, ER=20.0)
    p_null = np.abs(np.asarray(mzm(1.0 + 0j, jnp.array([2.0]), cfg))) ** 2
    p_peak = np.abs(np.asarray(mzm(1.0 + 0j, jnp.array([0.0]), cfg))) ** 2
    er_est = 10 * np.log10(p_peak[0] / p_null[0])
    assert np.isclose(er_est, 20.0, atol=0.5)


def test_iqm_modulates_i_and_q_independently():
    # Driving at u = Vpi*x around the null bias gives a field ~ linear in x
    n = 64
    u = 0.25 * (jnp.linspace(-1, 1, n) + 1j * jnp.linspace(1, -1, n))
    out = np.asarray(iqm(jnp.ones(n, dtype=jnp.complex64), 2.0 * u))
    # I and Q components should correlate with the real/imag drives
    corr_i = np.corrcoef(out.real, np.asarray(u.real))[0, 1]
    corr_q = np.corrcoef(out.imag, np.asarray(u.imag))[0, 1]
    assert abs(corr_i) > 0.99
    assert abs(corr_q) > 0.99


def test_pbs_splits_rotated_field():
    n = 16
    ex = jnp.ones(n, dtype=jnp.complex64)
    e = jnp.stack([ex, jnp.zeros_like(ex)], axis=1)
    x0, y0 = pbs(e, 0.0)
    assert np.allclose(np.asarray(x0), 1.0)
    assert np.allclose(np.asarray(y0), 0.0)
    x45, y45 = pbs(e, np.pi / 4)
    assert np.allclose(np.abs(np.asarray(x45)) ** 2, 0.5, atol=1e-6)
    assert np.allclose(np.abs(np.asarray(y45)) ** 2, 0.5, atol=1e-6)


def test_voa_attenuation():
    e = jnp.ones(10, dtype=jnp.complex64)
    out = voa(e, 3.0)
    assert np.isclose(float(sig_pow(out)), 10 ** (-0.3), rtol=1e-5)


def test_photodiode_ideal_square_law():
    e = jnp.asarray((np.arange(10) + 1).astype(np.complex64))
    cfg = PhotodiodeConfig(ideal=True)
    i_pd = np.asarray(photodiode(e, cfg))
    assert np.allclose(i_pd, (np.arange(10) + 1.0) ** 2)


def test_photodiode_noise_scales_with_power():
    key = jax.random.PRNGKey(0)
    fs = 64e9
    p_in = 1e-3
    e = jnp.sqrt(p_in) * jnp.ones(50000, dtype=jnp.complex64)
    cfg = PhotodiodeConfig(Fs=fs, B=30e9, bandwidthLimitation=False)
    i_pd = np.asarray(photodiode(e, cfg, key))
    assert np.isclose(np.mean(i_pd), p_in, rtol=0.01)
    # shot + thermal noise variance (scaled to simulation bandwidth)
    q, kb, t = 1.602e-19, 1.381e-23, 298.15
    var_exp = fs / (2 * 30e9) * (2 * q * p_in * 30e9 + 4 * kb * t * 30e9 / 50)
    assert np.isclose(np.var(i_pd), var_exp, rtol=0.1)


def test_edfa_gain_and_ase():
    key = jax.random.PRNGKey(1)
    fs = 64e9
    p_in = dbm2w(-10.0)
    e = jnp.sqrt(p_in) * jnp.ones(100_000, dtype=jnp.complex64)
    g_db, nf_db = 20.0, 4.5
    out = np.asarray(edfa(e, EDFAConfig(G=g_db, NF=nf_db, Fs=fs), key))
    p_out = np.mean(np.abs(out) ** 2)
    g_lin = 10 ** (g_db / 10)
    nf_lin = 10 ** (nf_db / 10)
    nsp = (g_lin * nf_lin - 1) / (2 * (g_lin - 1))
    p_ase = (g_lin - 1) * nsp * 6.62607e-34 * 193.1e12 * fs
    assert np.isclose(p_out, g_lin * float(p_in) + p_ase, rtol=0.02)


def test_hybrid_energy_conservation():
    n = 100
    rng = np.random.default_rng(2)
    es = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    elo = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    out = np.asarray(optical_hybrid_2x4(es, elo))
    p_in = np.sum(np.abs(np.asarray(es)) ** 2 + np.abs(np.asarray(elo)) ** 2)
    p_out = np.sum(np.abs(out) ** 2)
    assert np.isclose(p_out, p_in, rtol=1e-5)


def test_coherent_receiver_recovers_field():
    # ideal front end: output should be ~ Es * conj(Elo)
    n = 4096
    rng = np.random.default_rng(3)
    es = jnp.asarray((rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64))
    elo = jnp.exp(1j * 0.3) * jnp.ones(n, dtype=jnp.complex64)
    cfg_fe = CoherentFrontendConfig(Fs=64e9)
    cfg_pd = PhotodiodeConfig(ideal=True, Fs=64e9)
    s = np.asarray(coherent_receiver(es, elo, cfg_fe, cfg_pd))
    expected = np.asarray(es * jnp.conj(elo))
    corr = np.abs(np.vdot(s, expected)) / (
        np.linalg.norm(s) * np.linalg.norm(expected)
    )
    assert corr > 0.999


def test_pdm_coherent_receiver_shape_and_separation():
    n = 2048
    rng = np.random.default_rng(4)
    e = jnp.asarray(
        (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))).astype(np.complex64)
    )
    elo = jnp.ones(n, dtype=jnp.complex64)
    cfg = PDMFrontendConfig(Fs=64e9)
    s = np.asarray(pdm_coherent_receiver(e, elo, cfg))
    assert s.shape == (n, 2)
    # with no rotation, each output should track its own input polarization
    for k in range(2):
        corr = np.abs(np.vdot(s[:, k], np.asarray(e[:, k]))) / (
            np.linalg.norm(s[:, k]) * np.linalg.norm(np.asarray(e[:, k]))
        )
        assert corr > 0.99


def test_laser_power_and_linewidth():
    key = jax.random.PRNGKey(5)
    fs = 16e9
    cfg = LaserConfig(P=10.0, lw=1e5, RIN_var=0.0, Ns=200_000, Fs=fs)
    sig = np.asarray(basic_laser_model(cfg, key))
    assert np.isclose(np.mean(np.abs(sig) ** 2), float(dbm2w(10.0)), rtol=0.01)
    phi = np.unwrap(np.angle(sig))
    incr = np.diff(phi)
    assert np.isclose(np.var(incr), 2 * np.pi * 1e5 / fs, rtol=0.05)


def test_adc_quantization_and_resampling():
    key = jax.random.PRNGKey(6)
    n = 4096
    t = np.arange(n)
    x = jnp.asarray(0.8 * np.sin(2 * np.pi * 0.01 * t))
    cfg = ADCConfig(inFs=4.0, outFs=2.0, nBits=8, ENOB=8, AAF=True, N=101)
    y = np.asarray(adc(x, cfg, key))
    assert y.shape[0] == n // 2
    # waveform preserved (compare against decimated input away from edges)
    ref = 0.8 * np.sin(2 * np.pi * 0.01 * np.arange(0, n, 2))
    err = np.sqrt(np.mean((y[100:-100] - ref[100:-100]) ** 2))
    assert err < 0.02
