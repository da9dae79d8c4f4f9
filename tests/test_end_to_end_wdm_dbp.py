"""Integration tests for the remaining BASELINE configs.

- config 4 (test_WDM_amp_transmission): multi-channel WDM polmux over the
  Manakov channel with EDFAs; demultiplex the center channel and evaluate
  GMI after the coherent DSP chain.
- config 5 (test_NLC_withDBP_WDM_transmission): digital backpropagation
  improves on linear CD compensation in the nonlinear regime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.comm.metrics import fast_ber_calc, monte_carlo_gmi
from opticommpy_tpu.dsp import (
    CPRConfig,
    EDCConfig,
    MIMOEqualizerConfig,
    cpr,
    edc,
    manakov_dbp,
    mimo_adapt_equalizer,
)
from opticommpy_tpu.models import SSFMConfig, manakov_ssf
from opticommpy_tpu.models.config import LaserConfig, PDMFrontendConfig
from opticommpy_tpu.models.devices import basic_laser_model, pdm_coherent_receiver
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx
from opticommpy_tpu.ops import (
    decimate,
    fir_filter,
    lowpass_fir,
    pnorm,
    pulse_shape,
    symbol_sync,
)


def _coherent_dsp(sig_rx, symb_ref, cfg_tx, link_km, disp, n_train=6000,
                  use_dbp=None):
    """Matched filter -> decimate -> CDC (EDC or provided DBP output) -> sync
    -> MIMO EQ -> CPR. Returns (y, d) aligned symbol streams."""
    pulse = jnp.asarray(
        pulse_shape("rrc", cfg_tx.SpS, cfg_tx.nFilterTaps, cfg_tx.pulseRollOff)
    )
    sig_mf = fir_filter(pulse, sig_rx)
    sig_dec = decimate(sig_mf, cfg_tx.SpS, 2)
    if use_dbp is None:
        sig_cd = edc(sig_dec, EDCConfig(L=link_km, D=disp, Fs=2 * cfg_tx.Rs,
                                        Rs=cfg_tx.Rs))
    else:
        sig_cd = use_dbp
    d_ref = pnorm(symbol_sync(sig_cd, symb_ref, 2))
    n_sym = d_ref.shape[0]
    y_eq = mimo_adapt_equalizer(
        pnorm(sig_cd),
        MIMOEqualizerConfig(nTaps=15, SpS=2, mu=(5e-3, 2e-3),
                            alg=("da-rde", "dd-lms"),
                            L=(n_train, n_sym - n_train), M=16, numIter=2),
        symb_ref=d_ref,
    )
    y = cpr(y_eq, CPRConfig(alg="bps", M=16, N=75, B=64, Ts=1 / cfg_tx.Rs))
    disc = n_train + 1000
    return y[disc:-100], d_ref[disc:-100]


@pytest.fixture(scope="module")
def wdm_multichannel_link():
    """5-channel WDM polmux over 2x50 km with EDFAs (reduced config 4)."""
    key = jax.random.PRNGKey(11)
    k_tx, k_ch, k_lo, k_rx = jax.random.split(key, 4)
    cfg_tx = WDMTxConfig(
        M=16, Rs=32e9, SpS=16, nBits=2**15, nChannels=5, nPolModes=2,
        nFilterTaps=1024, pulseRollOff=0.01, powerPerChannel=(-1.0,),
        laserLinewidth=50e3, wdmGridSpacing=50e9,
    )
    fs = cfg_tx.Fs
    sig_tx, symb_tx, grid = simple_wdm_tx(k_tx, cfg_tx)
    cfg_ch = SSFMConfig(Ltotal=100, Lspan=50, alpha=0.2, D=16, gamma=1.3,
                        Fs=fs, amp="edfa", NF=4.5, nlprMethod=True)
    sig_ch = manakov_ssf(sig_tx, cfg_ch, k_ch)
    return cfg_tx, sig_ch, symb_tx, grid, fs, (k_lo, k_rx)


def test_wdm_multichannel_center_channel_gmi(wdm_multichannel_link):
    cfg_tx, sig_ch, symb_tx, grid, fs, (k_lo, k_rx) = wdm_multichannel_link
    # coherent detection of the center channel: LO at its carrier
    center = cfg_tx.nChannels // 2
    lo = basic_laser_model(
        LaserConfig(P=10.0, lw=50e3, Ns=sig_ch.shape[0], Fs=fs,
                    freqShift=float(grid[center]) + 40e6, RIN_var=0.0), k_lo)
    sig_rx = pdm_coherent_receiver(sig_ch, lo, PDMFrontendConfig(Fs=fs), key=k_rx)
    # tight low-pass to select the channel before decimation
    h_sel = jnp.asarray(lowpass_fir(0.6 * cfg_tx.Rs, fs, 501))
    sig_rx = fir_filter(h_sel, sig_rx)

    y, d = _coherent_dsp(sig_rx, symb_tx[:, :, center], cfg_tx, 100, 16)
    gmi, ngmi = monte_carlo_gmi(y, d, 16, "qam")
    assert float(jnp.min(gmi)) > 3.5, np.asarray(gmi)
    ber, _, snr = fast_ber_calc(y, d, 16, "qam")
    assert float(jnp.max(ber)) < 5e-3, np.asarray(ber)


@pytest.mark.slow
def test_dbp_beats_edc_in_nonlinear_regime():
    """Single-channel at high launch power: DBP > EDC (BASELINE config 5)."""
    key = jax.random.PRNGKey(21)
    k_tx, k_ch, k_lo, k_rx = jax.random.split(key, 4)
    cfg_tx = WDMTxConfig(
        M=16, Rs=32e9, SpS=8, nBits=2**15, nChannels=1, nPolModes=2,
        nFilterTaps=1024, pulseRollOff=0.01, powerPerChannel=(6.0,),
        laserLinewidth=0.0,
    )
    fs = cfg_tx.Fs
    sig_tx, symb_tx, _ = simple_wdm_tx(k_tx, cfg_tx)
    cfg_ch = SSFMConfig(Ltotal=200, Lspan=50, alpha=0.2, D=16, gamma=1.3,
                        Fs=fs, amp="edfa", NF=4.5, nlprMethod=True)
    sig_ch = manakov_ssf(sig_tx, cfg_ch, k_ch)

    lo = basic_laser_model(
        LaserConfig(P=10.0, lw=0.0, Ns=sig_ch.shape[0], Fs=fs, RIN_var=0.0),
        k_lo)
    sig_rx = pdm_coherent_receiver(sig_ch, lo, PDMFrontendConfig(Fs=fs), key=k_rx)

    # EDC arm
    y_edc, d_edc = _coherent_dsp(sig_rx, symb_tx[:, :, 0], cfg_tx, 200, 16)
    _, _, snr_edc = fast_ber_calc(y_edc, d_edc, 16, "qam")

    # DBP arm: back-propagate at full rate, then matched filter + decimate
    dbp_cfg = SSFMConfig(Ltotal=200, Lspan=50, alpha=0.2, D=16, gamma=1.3,
                         Fs=fs, amp="edfa", nlprMethod=False, hz=5.0,
                         trapIters=2)
    sig_dbp_full = manakov_dbp(sig_rx, dbp_cfg)
    pulse = jnp.asarray(pulse_shape("rrc", cfg_tx.SpS, 1024, 0.01))
    sig_dbp = decimate(fir_filter(pulse, sig_dbp_full), cfg_tx.SpS, 2)
    y_dbp, d_dbp = _coherent_dsp(sig_rx, symb_tx[:, :, 0], cfg_tx, 200, 16,
                                 use_dbp=sig_dbp)
    _, _, snr_dbp = fast_ber_calc(y_dbp, d_dbp, 16, "qam")

    assert float(jnp.mean(snr_dbp)) > float(jnp.mean(snr_edc)) + 0.5, (
        f"DBP {np.asarray(snr_dbp)} dB vs EDC {np.asarray(snr_edc)} dB"
    )
