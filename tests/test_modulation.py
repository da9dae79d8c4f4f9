"""Tests for modulation — property style after reference tests/test_modulation.py."""

import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import (
    bit_map,
    demodulate_gray,
    detector,
    gray_mapping,
    min_euclid,
    mlse,
    modulate_gray,
    soft_mapper,
)
from opticommpy_tpu.comm.modulation import qam_const


def test_modulate_demodulate_roundtrip():
    # reference tests/test_modulation.py:114-125
    rng = np.random.default_rng(0)
    for M, ctype in [(4, "qam"), (16, "qam"), (64, "qam"), (8, "psk"),
                     (4, "pam"), (2, "ook"), (16, "apsk")]:
        b = int(np.log2(M))
        bits = rng.integers(0, 2, size=600 * b // b * b)
        symb = modulate_gray(jnp.asarray(bits), M, ctype)
        bits_back = np.asarray(demodulate_gray(symb, M, ctype))
        assert np.array_equal(bits_back, bits), (M, ctype)


def test_gray_neighbors_differ_one_bit():
    # reference tests/test_modulation.py:137-154: adjacent QAM grid points
    # differ in exactly one bit of their Gray label
    M = 16
    const = gray_mapping(M, "qam")
    bmap = bit_map(M, "qam")
    # find all pairs at minimum distance
    d = np.abs(const[:, None] - const[None, :])
    dmin = np.min(d[d > 0])
    for i in range(M):
        for j in range(M):
            if i != j and np.isclose(d[i, j], dmin):
                diff = np.sum(bmap[i] != bmap[j])
                assert diff == 1


def test_constellation_energy_qam16():
    const = qam_const(16).reshape(-1)
    assert len(const) == 16
    assert np.isclose(np.mean(np.abs(const) ** 2), 10.0)  # {±1,±3} grid


def test_min_euclid_identity():
    const = jnp.asarray(gray_mapping(16, "qam"))
    ind = np.asarray(min_euclid(const, const))
    assert np.array_equal(ind, np.arange(16))


def test_detector_map_ml_agree_uniform_prior():
    rng = np.random.default_rng(1)
    const = jnp.asarray(gray_mapping(16, "qam"))
    r = jnp.asarray(
        rng.normal(size=500) + 1j * rng.normal(size=500)
    ) * 3.0
    dec_map, ind_map = detector(r, 0.1, const, rule="MAP")
    dec_ml, ind_ml = detector(r, 0.1, const, rule="ML")
    assert np.array_equal(np.asarray(ind_map), np.asarray(ind_ml))


def test_soft_mapper_hard_llrs_recover_symbols():
    # very confident LLRs -> soft symbols collapse to the constellation points
    rng = np.random.default_rng(2)
    M = 16
    b = 4
    bits = rng.integers(0, 2, size=100 * b)
    llr = jnp.asarray(1.0 - 2.0 * bits) * 50.0  # LLR>0 <-> bit 0
    soft_mean, soft_var = soft_mapper(llr, M, "qam")
    expected = modulate_gray(jnp.asarray(bits), M, "qam")
    expected = expected / jnp.sqrt(jnp.mean(jnp.abs(jnp.asarray(gray_mapping(M, 'qam'))) ** 2))
    assert np.allclose(np.asarray(soft_mean), np.asarray(expected), atol=1e-3)
    assert np.all(np.asarray(soft_var) < 1e-3)


def test_mlse_recovers_isi_sequence():
    rng = np.random.default_rng(3)
    const = gray_mapping(4, "pam")
    const = const / np.sqrt(np.mean(np.abs(const) ** 2))
    n = 300
    x = const[rng.integers(0, 4, size=n)]
    h = np.array([1.0, 0.45])  # 1-tap ISI channel
    y = np.convolve(x, h)[:n] + 0.01 * rng.normal(size=n)
    x_hat = np.asarray(mlse(jnp.asarray(y), h, const))
    # ignore trailing edge (traceback truncation)
    assert np.mean(np.abs(x_hat[:-5] - x[:-5]) < 1e-3) > 0.98
