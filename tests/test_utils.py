"""Tests for opticommpy_tpu.utils — property style after reference tests/test_utils.py."""

import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.utils import (
    ber2qfactor,
    bitarray2dec,
    db2lin,
    dbm2w,
    dec2bitarray,
    lin2db,
    llr2bit_prob,
    w2dbm,
)


def test_db_linear_inverses():
    x = jnp.array([0.5, 1.0, 2.0, 100.0])
    assert np.allclose(db2lin(lin2db(x)), x, rtol=1e-5)
    assert np.allclose(lin2db(db2lin(jnp.array([-3.0, 0.0, 10.0]))),
                       [-3.0, 0.0, 10.0], rtol=1e-5)


def test_dbm2w_known_values():
    assert np.isclose(float(dbm2w(0.0)), 1e-3, rtol=1e-6)
    assert np.isclose(float(dbm2w(30.0)), 1.0, rtol=1e-6)
    assert np.isclose(float(w2dbm(1e-3)), 0.0, atol=1e-6)


def test_bitarray_roundtrip_msb_first():
    # MSB-first ordering: 6 -> [1, 1, 0]
    assert np.array_equal(np.asarray(dec2bitarray(6, 3)), [1, 1, 0])
    vals = np.array([0, 1, 5, 13, 15])
    bits = dec2bitarray(vals, 4)
    assert bits.shape == (5, 4)
    back = bitarray2dec(jnp.asarray(bits).T)
    assert np.array_equal(np.asarray(back), vals)


def test_ber2qfactor_known_point():
    # BER = 0.5*erfc(Q/sqrt(2)); for Q = 2 (6.02 dB), BER ~= 0.02275
    q_db = float(ber2qfactor(0.0227501))
    assert np.isclose(q_db, 10 * np.log10(2.0), atol=1e-2)


def test_llr2bit_prob_stable_sigmoid():
    llr = jnp.array([[-1000.0, 0.0, 1000.0, 2.0]])
    p = np.asarray(llr2bit_prob(llr))
    assert np.isclose(p[0, 0], 1.0)
    assert np.isclose(p[0, 1], 0.5)
    assert np.isclose(p[0, 2], 0.0)
    assert np.isclose(p[0, 3], 1 / (1 + np.exp(2.0)), rtol=1e-5)
    assert np.all(np.isfinite(p))
