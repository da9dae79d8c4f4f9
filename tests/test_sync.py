"""Tests for sequence synchronization and symbol_sync 'real' mode."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import modulate_gray
from opticommpy_tpu.dsp import SyncConfig, sync_data_sequences
from opticommpy_tpu.ops import fir_filter, pnorm, pulse_shape, symbol_sync, upsample


def test_symbol_sync_real_mode_resolves_rotation():
    rng = np.random.default_rng(0)
    levels = np.array([-3.0, -1.0, 1.0, 3.0])
    const = (levels[:, None] + 1j * levels[None, :]).ravel() / np.sqrt(10)
    tx = const[rng.integers(0, 16, size=(2000, 1))].astype(np.complex64)
    # received: rotated by pi/2 and delayed
    rx = np.roll(1j * tx, 31, axis=0)
    tx_sync = np.asarray(symbol_sync(jnp.asarray(rx), jnp.asarray(tx), 1,
                                     mode="real"))
    match = np.mean(np.abs(tx_sync[50:-50] - rx[50:-50]) < 1e-3)
    assert match > 0.99


def test_sync_data_sequences_signal_reference():
    rng = np.random.default_rng(1)
    sps = 4
    n_sym = 1000
    symb = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=2 * n_sym)),
                               4, "pam"))
    pulse = jnp.asarray(pulse_shape("rrc", sps, 256, 0.1))
    tx_wave = fir_filter(pulse, upsample(symb, sps))
    # rx = delayed copy of the tx waveform
    rx = jnp.roll(tx_wave, 57 * sps)
    cfg = SyncConfig(SpS=sps, reference="signal", constType="pam", M=4)
    tx_s, symb_det = sync_data_sequences(rx, tx_wave, cfg)
    # synchronized waveform should match rx away from the roll seam
    err = np.mean(np.abs(np.asarray(tx_s[300:-300]) - np.asarray(rx[300:-300])) ** 2)
    ref = np.mean(np.abs(np.asarray(rx[300:-300])) ** 2)
    assert err / ref < 0.05
    assert symb_det.shape[0] > 0
