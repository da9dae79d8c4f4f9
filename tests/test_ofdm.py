"""Tests for OFDM mod/demod — inverse closures and pilot equalization.

The reference has no OFDM tests (SURVEY.md §4 coverage gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import modulate_gray
from opticommpy_tpu.comm.ofdm import (
    OFDMConfig,
    calc_symbol_rate,
    zero_pad,
    demodulate_ofdm,
    hermit,
    modulate_ofdm,
)
from opticommpy_tpu.ops import pnorm


def _qam_symbols(n, M=16, seed=0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=n * int(np.log2(M)))
    return pnorm(modulate_gray(jnp.asarray(bits), M, "qam"))


def test_hermit_ifft_is_real():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=16) + 1j * rng.normal(size=16))
    vh = hermit(v)
    assert vh.shape[0] == 34
    x = np.fft.ifft(np.fft.ifftshift(np.asarray(vh)))
    assert np.max(np.abs(x.imag)) < 1e-6 * np.max(np.abs(x.real))


def test_ofdm_mod_demod_roundtrip_no_channel():
    cfg = OFDMConfig(Nfft=64, G=8, SpS=1, pilotCarriers=(), nullCarriers=())
    symb = _qam_symbols(64 * 10)
    sig = modulate_ofdm(symb, cfg)
    assert sig.shape[0] == 10 * (64 + 8)
    rec = demodulate_ofdm(sig, cfg)
    assert np.allclose(np.asarray(rec), np.asarray(symb), atol=1e-4)


def test_ofdm_pilot_equalization_flat_channel():
    pilots = tuple(range(0, 64, 8))
    cfg = OFDMConfig(Nfft=64, G=8, SpS=1, pilotCarriers=pilots)
    ni = 64 - len(pilots)
    symb = _qam_symbols(ni * 20, seed=2)
    sig = modulate_ofdm(symb, cfg)
    # flat complex channel gain
    h = 0.8 * np.exp(1j * 0.7)
    rec = demodulate_ofdm(h * sig, cfg)
    assert np.allclose(np.asarray(rec), np.asarray(symb), atol=1e-3)


def test_ofdm_pilot_equalization_dispersive_channel():
    pilots = tuple(range(0, 64, 4))
    cfg = OFDMConfig(Nfft=64, G=16, SpS=1, pilotCarriers=pilots)
    ni = 64 - len(pilots)
    symb = _qam_symbols(ni * 50, seed=3)
    sig = np.asarray(modulate_ofdm(symb, cfg))
    # 3-tap channel (within the CP length) applied circularly per frame
    h_ch = np.array([1.0, 0.35, 0.12]).astype(complex)
    rx = np.convolve(sig, h_ch)[: len(sig)]
    rec, h_est = demodulate_ofdm(jnp.asarray(rx), cfg, return_channel=True)
    # single-tap equalization recovers most symbols (edge subcarriers are
    # extrapolated, allow a small error floor)
    err = np.mean(np.abs(np.asarray(rec) - np.asarray(symb)) ** 2)
    assert err < 0.05
    assert h_est.shape[0] == 64


def test_ofdm_hermitian_real_output():
    cfg = OFDMConfig(Nfft=64, G=4, SpS=2, hermitSymmetry=True)
    ni = 64 // 2 - 1
    symb = _qam_symbols(ni * 8, seed=4)
    sig = np.asarray(modulate_ofdm(symb, cfg))
    assert np.max(np.abs(sig.imag)) < 1e-5 * np.max(np.abs(sig.real))


def test_calc_symbol_rate():
    rs = calc_symbol_rate(16, 100e9, 512, 16, 32, False)
    assert rs > 0
    # fewer data carriers -> higher required symbol rate
    rs2 = calc_symbol_rate(16, 100e9, 512, 64, 32, False)
    assert rs2 > rs


def test_zero_pad():
    out = np.asarray(zero_pad(np.array([1.0, 2.0, 3.0]), 2))
    assert out.shape == (7,)
    assert np.array_equal(out, [0, 0, 1, 2, 3, 0, 0])
