"""Flagship end-to-end test: coherent 16-QAM polmux over the Manakov channel.

Replicates the reference's test_WDM_transmission workflow (SURVEY.md §3.1,
BASELINE.json config 3) at reduced scale: WDM Tx -> Manakov SSFM -> PDM
coherent receiver -> matched filter -> decimation -> EDC -> symbol sync ->
MIMO adaptive equalization -> carrier phase recovery -> BER/GMI/EVM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.comm.metrics import calc_evm, fast_ber_calc, monte_carlo_gmi
from opticommpy_tpu.dsp import CPRConfig, EDCConfig, MIMOEqualizerConfig, cpr, edc, mimo_adapt_equalizer
from opticommpy_tpu.models import (
    LaserConfig,
    PDMFrontendConfig,
    SSFMConfig,
    basic_laser_model,
    manakov_ssf,
    pdm_coherent_receiver,
)
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx
from opticommpy_tpu.ops import decimate, fir_filter, pnorm, pulse_shape, symbol_sync


@pytest.fixture(scope="module")
def coherent_chain_results():
    key = jax.random.PRNGKey(42)
    k_tx, k_ch, k_lo, k_rx = jax.random.split(key, 4)

    # --- transmitter: single-channel 16-QAM polmux ---
    cfg_tx = WDMTxConfig(
        M=16, Rs=32e9, SpS=8, nBits=2**16, nChannels=1, nPolModes=2,
        nFilterTaps=1024, pulseRollOff=0.01, powerPerChannel=(1.0,),
        laserLinewidth=30e3,
    )
    fs = cfg_tx.Fs
    sig_tx, symb_tx, _ = simple_wdm_tx(k_tx, cfg_tx)

    # --- channel: 2x50 km Manakov with EDFAs ---
    cfg_ch = SSFMConfig(
        Ltotal=100, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
        amp="edfa", NF=4.5, nlprMethod=True, maxNlinPhaseRot=2e-2,
    )
    sig_ch = manakov_ssf(sig_tx, cfg_ch, k_ch)

    # --- coherent receiver ---
    lo = basic_laser_model(
        LaserConfig(P=10.0, lw=30e3, Ns=sig_ch.shape[0], Fs=fs, freqShift=64e6,
                    RIN_var=0.0),
        k_lo,
    )
    sig_rx = pdm_coherent_receiver(sig_ch, lo, PDMFrontendConfig(Fs=fs), key=k_rx)

    # --- DSP chain ---
    pulse = jnp.asarray(pulse_shape("rrc", cfg_tx.SpS, 1024, cfg_tx.pulseRollOff))
    sig_mf = fir_filter(pulse, sig_rx)  # matched filter
    sig_dec = decimate(sig_mf, cfg_tx.SpS, 2)  # to 2 SpS

    sig_cd = edc(sig_dec, EDCConfig(L=100, D=16, Fc=193.1e12, Fs=2 * 32e9, Rs=32e9))

    symb_ref = symb_tx[:, :, 0]  # (nSym, 2)
    tx_sync = symbol_sync(sig_cd, symb_ref, 2)

    x_in = pnorm(sig_cd)
    d_ref = pnorm(tx_sync)
    n_sym = d_ref.shape[0]
    n_train = 8000
    cfg_eq = MIMOEqualizerConfig(
        nTaps=15, SpS=2, mu=(5e-3, 2e-3), alg=("da-rde", "dd-lms"),
        L=(n_train, n_sym - n_train), M=16, numIter=2,
    )
    y_eq = mimo_adapt_equalizer(x_in, cfg_eq, symb_ref=d_ref)

    # --- carrier phase recovery ---
    y_cpr = cpr(y_eq, CPRConfig(alg="bps", M=16, N=75, B=64, Ts=1 / 32e9,
                                runFOE=True))

    # discard transient
    disc = 9000
    y = y_cpr[disc:-100]
    d = d_ref[disc:-100]
    return y, d


def test_coherent_chain_ber(coherent_chain_results):
    y, d = coherent_chain_results
    ber, ser, snr = fast_ber_calc(y, d, 16, "qam")
    # 1 dBm launch over 100 km: expect essentially error-free after DSP
    assert float(jnp.max(ber)) < 2e-3, f"BER too high: {np.asarray(ber)}"
    assert float(jnp.min(snr)) > 15.0


def test_coherent_chain_gmi(coherent_chain_results):
    y, d = coherent_chain_results
    gmi, ngmi = monte_carlo_gmi(y, d, 16, "qam")
    assert float(jnp.min(gmi)) > 3.7  # close to 4 bits/symbol
    assert float(jnp.min(ngmi)) > 0.92


def test_coherent_chain_evm(coherent_chain_results):
    y, d = coherent_chain_results
    evm = calc_evm(y, 16, "qam", symb_tx=d)
    assert float(jnp.max(evm)) < 0.05  # better than -13 dB EVM
