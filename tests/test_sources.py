"""Tests for bit/symbol sources."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import bit_source, cazac_sequence, prbs_generator, symbol_source


def test_bit_source_random_balanced_and_deterministic():
    key = jax.random.PRNGKey(0)
    b1 = np.asarray(bit_source(key, 10000))
    b2 = np.asarray(bit_source(key, 10000))
    assert np.array_equal(b1, b2)
    assert set(np.unique(b1)) <= {0, 1}
    assert abs(np.mean(b1) - 0.5) < 0.02


def test_prbs7_full_period_properties():
    order = 7
    bits = np.asarray(prbs_generator(order))
    assert len(bits) == 2**order - 1
    # maximal-length LFSR: 2^(n-1) ones, 2^(n-1)-1 zeros
    assert np.sum(bits) == 2 ** (order - 1)
    # sequence must not repeat within the period
    half = 2 ** (order - 1)
    assert not np.array_equal(bits[:half], bits[half : 2 * half])


def test_symbol_source_unit_energy():
    key = jax.random.PRNGKey(1)
    s = symbol_source(key, 50000, M=16, const_type="qam")
    assert np.isclose(np.mean(np.abs(np.asarray(s)) ** 2), 1.0, rtol=0.02)


def test_symbol_source_maxwell_boltzmann_shaping():
    key = jax.random.PRNGKey(2)
    s_uni = np.asarray(symbol_source(key, 50000, M=64, const_type="qam"))
    s_mb = np.asarray(
        symbol_source(key, 50000, M=64, const_type="qam",
                      dist="maxwell-boltzmann", shaping_factor=0.1)
    )
    # shaping increases the fraction of low-energy symbols -> lower kurtosis of radius
    assert np.mean(np.abs(s_mb) ** 4) != np.mean(np.abs(s_uni) ** 4)


def test_cazac_constant_amplitude_zero_autocorr():
    n = 63
    z = np.asarray(cazac_sequence(n, 1))
    assert np.allclose(np.abs(z), 1.0, atol=1e-5)
    # periodic autocorrelation is zero off-peak
    for shift in [1, 5, 17]:
        r = np.abs(np.sum(z * np.conj(np.roll(z, shift))))
        assert r < 1e-3 * n
