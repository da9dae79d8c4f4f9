"""Tests for metrics — property style after reference tests/test_metrics.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.comm import modulate_gray, symbol_source
from opticommpy_tpu.comm.metrics import (
    bert,
    calc_evm,
    calc_lin_osnr,
    calc_llr,
    fast_ber_calc,
    monte_carlo_gmi,
    monte_carlo_mi,
    qfunc,
    theory_ber,
    theory_mi,
)
from opticommpy_tpu.comm.modulation import bit_map, gray_mapping
from opticommpy_tpu.ops import gaussian_complex_noise, pnorm


def _awgn_symbols(key, M, ctype, snr_db, n=30000):
    rng = np.random.default_rng(0)
    b = int(np.log2(M))
    bits = rng.integers(0, 2, size=n * b)
    tx = pnorm(modulate_gray(jnp.asarray(bits), M, ctype))
    noise_var = 10 ** (-snr_db / 10)
    noise = gaussian_complex_noise(key, tx.shape, noise_var)
    return tx + noise, tx, bits


def test_fast_ber_matches_theory():
    # reference tests/test_metrics.py:55-63: measured BER within 20% of theory
    key = jax.random.PRNGKey(0)
    for M, snr_db in [(4, 10.0), (16, 16.0)]:
        b = int(np.log2(M))
        ebn0_db = snr_db - 10 * np.log10(b)
        rx, tx, _ = _awgn_symbols(key, M, "qam", snr_db, n=100_000)
        ber, ser, snr_est = fast_ber_calc(rx, tx, M, "qam")
        ber_th = float(theory_ber(M, ebn0_db, "qam"))
        assert abs(float(ber[0]) - ber_th) / ber_th < 0.25, (M, snr_db)
        assert np.isclose(float(snr_est[0]), snr_db, atol=0.5)


def test_gmi_saturates_at_high_snr():
    # reference tests/test_metrics.py:129-135
    key = jax.random.PRNGKey(1)
    M = 16
    rx, tx, _ = _awgn_symbols(key, M, "qam", 30.0, n=30000)
    gmi, ngmi = monte_carlo_gmi(rx, tx, M, "qam")
    assert np.isclose(float(gmi[0]), np.log2(M), rtol=1e-3)
    assert np.isclose(float(ngmi[0]), 1.0, rtol=1e-3)


def test_mi_saturates_at_high_snr():
    key = jax.random.PRNGKey(2)
    M = 16
    rx, tx, _ = _awgn_symbols(key, M, "qam", 30.0, n=20000)
    mi = monte_carlo_mi(rx, tx, M, "qam")
    assert np.isclose(float(mi[0]), np.log2(M), rtol=1e-2)


def test_evm_matches_noise_power():
    key = jax.random.PRNGKey(3)
    snr_db = 20.0
    rx, tx, _ = _awgn_symbols(key, 16, "qam", snr_db, n=50000)
    evm = calc_evm(rx, 16, "qam", symb_tx=tx)
    assert np.isclose(float(evm[0]), 10 ** (-snr_db / 10), rtol=0.1)


def test_bert_ook_clean_signal():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, size=10000)
    i_rx = bits + 0.05 * rng.normal(size=bits.shape)
    ber, q = bert(jnp.asarray(i_rx), jnp.asarray(bits))
    assert float(ber) == 0.0
    assert float(q) > 6.0


def test_calc_llr_sign_matches_bits():
    # strong SNR: LLR sign should encode the transmitted bit (LLR>0 -> bit 0)
    key = jax.random.PRNGKey(5)
    M = 16
    rx, tx, bits = _awgn_symbols(key, M, "qam", 25.0, n=2000)
    const = gray_mapping(M, "qam")
    es = np.mean(np.abs(const) ** 2)
    llr = calc_llr(rx, 10 ** (-25 / 10), jnp.asarray(const / np.sqrt(es)),
                   bit_map(M, "qam"), jnp.ones(M) / M)
    hard = (np.asarray(llr) < 0).astype(int)
    assert np.mean(hard == bits) > 0.999


def test_qfunc_known_values():
    assert np.isclose(float(qfunc(0.0)), 0.5)
    assert np.isclose(float(qfunc(3.0)), 0.00135, atol=1e-4)


@pytest.mark.slow
def test_theory_mi_qpsk_high_snr():
    mi = theory_mi(4, "qam", 20.0, lim=3.0)
    assert np.isclose(mi, 2.0, atol=0.05)


def test_calc_lin_osnr_monotone_decreasing():
    osnr = calc_lin_osnr(10, 0.0, 0.2, 80, 40.0)
    assert len(osnr) == 11
    assert np.all(np.diff(osnr) < 0)
