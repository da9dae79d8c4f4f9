"""Tests for carrier phase/frequency recovery and clock recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import modulate_gray
from opticommpy_tpu.comm.metrics import fast_ber_calc
from opticommpy_tpu.dsp import (
    ClockRecoveryConfig,
    CPRConfig,
    bps,
    cpr,
    ddpll,
    fourth_power_foe,
    gardner_clock_recovery,
    viterbi,
)
from opticommpy_tpu.ops import (
    clock_sampling_interp,
    fir_filter,
    gaussian_complex_noise,
    phase_noise,
    pnorm,
    pulse_shape,
    upsample,
)
from opticommpy_tpu.comm.modulation import gray_mapping


def _noisy_rotated_qam(key, M=16, n=20000, snr_db=25.0, lw_ts=1e-5):
    k1, k2, k3 = jax.random.split(key, 3)
    rng = np.random.default_rng(0)
    b = int(np.log2(M))
    bits = rng.integers(0, 2, size=n * b)
    tx = pnorm(modulate_gray(jnp.asarray(bits), M, "qam"))
    phi = phase_noise(k2, lw_ts, n, 1.0)  # variance 2*pi*lw_ts per step
    noise = gaussian_complex_noise(k3, (n,), 10 ** (-snr_db / 10))
    rx = tx * jnp.exp(1j * phi) + noise
    return rx, tx, phi


def test_bps_tracks_phase_noise():
    key = jax.random.PRNGKey(0)
    rx, tx, phi = _noisy_rotated_qam(key, lw_ts=2e-6)
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    est = bps(rx, 17, const, 64)
    # BPS estimates the *compensating* phase (mod pi/2)
    err = np.angle(np.exp(1j * 4 * (np.asarray(est) + np.asarray(phi)))) / 4
    assert np.std(err[200:-200]) < 0.05


def test_cpr_bps_improves_ber():
    key = jax.random.PRNGKey(1)
    rx, tx, _ = _noisy_rotated_qam(key, snr_db=22.0, lw_ts=2e-6)
    cfg = CPRConfig(alg="bps", M=16, N=35, B=64, runFOE=False)
    rec = cpr(rx, cfg)
    # phase-noise-corrupted BER should be terrible; recovered should be clean
    ber_raw = float(fast_ber_calc(rx, tx, 16, "qam")[0][0])
    # account for the pi/2-ambiguity of blind CPR: try all 4 rotations
    bers = []
    for k in range(4):
        bers.append(float(fast_ber_calc(rec * 1j**k, tx, 16, "qam")[0][0]))
    assert min(bers) < 0.01
    assert min(bers) < ber_raw


def test_ddpll_tracks_slow_phase():
    key = jax.random.PRNGKey(2)
    rx, tx, phi = _noisy_rotated_qam(key, M=4, snr_db=25.0, lw_ts=1e-7)
    const = pnorm(jnp.asarray(gray_mapping(4, "qam")))
    ts = 1 / 32e9
    est = ddpll(rx, ts, 0.1, 1 / (2 * np.pi * 10e6), 1 / (2 * np.pi * 10e6),
                const, symb_tx=tx[:, None] if tx.ndim == 1 else tx)
    est = np.asarray(est).reshape(-1)
    err = np.angle(np.exp(1j * 4 * (est + np.asarray(phi)))) / 4
    assert np.std(err[2000:]) < 0.08


def test_viterbi_recovers_constant_offset():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    n = 5000
    tx = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=2 * n)), 4, "qam"))
    phi0 = 0.12
    rx = tx * np.exp(1j * phi0)
    est = viterbi(rx[:, None], 35, 4)
    # Viterbi&Viterbi estimates the compensating phase: est ~ -phi0 (mod pi/2)
    err = np.angle(np.exp(1j * 4 * (np.asarray(est)[100:-100, 0] + phi0))) / 4
    assert np.abs(np.mean(err)) < 0.02


def test_fourth_power_foe_estimates_offset():
    key = jax.random.PRNGKey(4)
    rng = np.random.default_rng(5)
    n = 2**14
    rs = 32e9
    tx = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=4 * n)), 16, "qam"))
    fo_true = 200e6
    t = np.arange(n) / rs
    rx = tx * jnp.asarray(np.exp(1j * 2 * np.pi * fo_true * t))
    out, fo_est = fourth_power_foe(rx, rs, 4)
    assert abs(float(fo_est) - fo_true) < rs / n  # within one FFT bin


def test_gardner_clock_recovery_fixes_sampling_offset():
    key = jax.random.PRNGKey(5)
    rng = np.random.default_rng(6)
    sps = 2
    n_sym = 8000
    symb = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=2 * n_sym)), 4, "qam"))
    pulse = jnp.asarray(pulse_shape("rrc", sps, 512, 0.2))
    sig = fir_filter(pulse, upsample(symb, sps))
    # introduce a 200-ppm clock offset by resampling
    sig_off = clock_sampling_interp(sig, 1.0, 1.0 / (1 + 200e-6))
    rec, timing = gardner_clock_recovery(
        sig_off, ClockRecoveryConfig(kp=2e-3, ki=1e-5, isNyquist=False),
        return_timing=True,
    )
    # the NCO timing should ramp (tracking the ppm offset), and the recovered
    # signal should have samples at consistent symbol phases: even samples
    # carry the symbols
    rec = np.asarray(rec)
    sampled = rec[2000:2000 + 4000 * sps:sps]
    # decision-point variance concentrated near constellation radii
    radii = np.abs(sampled) / np.mean(np.abs(sampled))
    assert np.std(radii) < 0.25


def test_gardner_pallas_matches_while_loop():
    """The Pallas NCO kernel reproduces the while_loop sample-by-sample."""
    rng = np.random.default_rng(7)
    sps = 2
    n_sym = 5000
    symb = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=2 * n_sym)), 4, "qam"))
    pulse = jnp.asarray(pulse_shape("rrc", sps, 512, 0.2))
    sig = fir_filter(pulse, upsample(symb, sps))
    sig_off = clock_sampling_interp(sig, 1.0, 1.0 / (1 + 300e-6))
    cfg = ClockRecoveryConfig(kp=2e-3, ki=1e-5, isNyquist=False)
    rec_w, tv_w = gardner_clock_recovery(sig_off, cfg, return_timing=True)
    rec_p, tv_p = gardner_clock_recovery(sig_off, cfg, return_timing=True,
                                         backend="pallas")
    nl = min(rec_w.shape[0], rec_p.shape[0])
    assert abs(rec_w.shape[0] - rec_p.shape[0]) <= 2
    assert np.max(np.abs(np.asarray(rec_w)[:nl] - np.asarray(rec_p)[:nl])) < 1e-5
    assert np.max(np.abs(np.asarray(tv_w)[:nl] - np.asarray(tv_p)[:nl])) < 1e-5


def test_gardner_static_out_prefix_and_jittable():
    """static_out=True (round 5): the fixed-length output's prefix is
    identical to the cropped dynamic path, and the call traces under an
    outer jit (the crop's host sync would fail there)."""
    rng = np.random.default_rng(8)
    sps, n_sym = 2, 4000
    symb = pnorm(modulate_gray(jnp.asarray(rng.integers(0, 2, size=2 * n_sym)),
                               4, "qam"))
    pulse = jnp.asarray(pulse_shape("rrc", sps, 512, 0.2))
    sig = fir_filter(pulse, upsample(symb, sps))
    sig_off = clock_sampling_interp(sig, 1.0, 1.0 / (1 + 200e-6))
    cfg = ClockRecoveryConfig(kp=2e-3, ki=1e-5, isNyquist=False)
    rec = gardner_clock_recovery(sig_off, cfg)
    rec_s = gardner_clock_recovery(sig_off, cfg, static_out=True)
    n_out = int((1 - cfg.maxPPM / 1e6) * (sig_off.shape[0] + cfg.lpad))
    assert rec_s.shape[0] == n_out
    nl = min(rec.shape[0], rec_s.shape[0])
    np.testing.assert_array_equal(np.asarray(rec)[:nl],
                                  np.asarray(rec_s)[:nl])

    @jax.jit
    def chain(s):
        return jnp.sum(jnp.abs(gardner_clock_recovery(s, cfg,
                                                      static_out=True)))

    assert np.isfinite(float(chain(sig_off)))


def test_gardner_pallas_two_modes_nyquist():
    """Two polarizations, Nyquist TED, odd length: the wrapper paths."""
    rng = np.random.default_rng(8)
    sps = 2
    n_sym = 3001
    cols = []
    for s in range(2):
        symb = pnorm(modulate_gray(
            jnp.asarray(rng.integers(0, 2, size=2 * n_sym)), 4, "qam"))
        cols.append(fir_filter(jnp.asarray(pulse_shape("rrc", sps, 512, 0.2)),
                               upsample(symb, sps)))
    sig = jnp.stack(cols, axis=1)
    sig_off = clock_sampling_interp(sig, 1.0, 1.0 / (1 - 150e-6))
    cfg = ClockRecoveryConfig()  # isNyquist=True default
    rec_w = gardner_clock_recovery(sig_off, cfg)
    rec_p = gardner_clock_recovery(sig_off, cfg, backend="pallas")
    assert rec_p.ndim == 2 and rec_p.shape[1] == 2
    nl = min(rec_w.shape[0], rec_p.shape[0])
    assert np.max(np.abs(np.asarray(rec_w)[:nl] - np.asarray(rec_p)[:nl])) < 1e-5


def test_residual_linewidth_estimate():
    """residual_linewidth recovers a known Lorentzian linewidth (r1 nit).

    Matches the reference's in-cpr estimate (carrierRecovery.py:154-162):
    var of central-half phase increments / (2 pi Ts).
    """
    import jax
    from opticommpy_tpu.dsp import residual_linewidth

    Ts = 1 / 32e9
    lw_true = 200e3  # Hz
    sigma = np.sqrt(2 * np.pi * lw_true * Ts)
    key = jax.random.PRNGKey(0)
    steps = sigma * jax.random.normal(key, (200000, 2))
    phase = jnp.cumsum(steps, axis=0)
    lw_est = float(residual_linewidth(phase, Ts))
    assert abs(lw_est - lw_true) / lw_true < 0.05


def test_cpr_return_linewidth():
    import jax
    from opticommpy_tpu.dsp import CPRConfig, cpr
    from opticommpy_tpu.comm import modulate_gray
    from opticommpy_tpu.ops import pnorm

    key = jax.random.PRNGKey(1)
    symb = pnorm(modulate_gray(
        jax.random.randint(key, (4000 * 2,), 0, 2), 4, "qam").reshape(-1, 2))
    cfg = CPRConfig(alg="bps", M=4, B=32, N=16, runFOE=False)
    out, phases, lw = cpr(symb, cfg, return_phases=True,
                          return_linewidth=True)
    assert out.shape == symb.shape and phases.shape == symb.shape
    assert float(lw) >= 0.0
    # 2-tuple and plain returns still work
    out2, lw2 = cpr(symb, cfg, return_linewidth=True)
    out3 = cpr(symb, cfg)
    assert np.allclose(np.asarray(out2), np.asarray(out))
    assert np.asarray(out3).shape == symb.shape


def _ffw_test_signal(rng, n_sym, rolloff, noise=0.05):
    from opticommpy_tpu.comm.modulation import gray_mapping

    const = gray_mapping(16, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)
    sym = const[rng.integers(0, 16, size=(n_sym, 2))]
    pulse = jnp.asarray(pulse_shape("rrc", 2, 1025, rolloff).astype(np.float32))
    x = pnorm(fir_filter(pulse, upsample(jnp.asarray(sym), 2)))
    x = x + (noise * (rng.standard_normal(x.shape)
                      + 1j * rng.standard_normal(x.shape))).astype(np.complex64)
    return x


def test_ffw_clock_recovery_estimates_and_corrects_ppm():
    """Feedforward block-parallel clock recovery: the band-edge
    spectral-line estimator recovers the clock offset to sub-ppm even at
    rolloff 0.01 (where the excess band is 1% of the spectrum), and the
    parallel cubic resampler retimes the signal. No recurrence anywhere
    — the TPU-first counterpart of the Gardner NCO for the reference's
    clockSamplingInterp impairment model (core.py:272)."""
    from opticommpy_tpu.dsp import FFWClockRecoveryConfig, ffw_clock_recovery

    rng = np.random.default_rng(7)
    for rolloff, ppm_true in ((0.01, 200.0), (0.2, -120.0)):
        x = _ffw_test_signal(rng, 2**15, rolloff)
        x_off = clock_sampling_interp(x, 2.0, 2.0 * (1 + ppm_true * 1e-6))
        cfg = FFWClockRecoveryConfig(rollOff=rolloff)
        y, (ppm_est, _) = jax.jit(
            lambda s: ffw_clock_recovery(s, cfg, return_est=True))(x_off)
        assert abs(float(ppm_est) - ppm_true) < 3.0, (rolloff, float(ppm_est))
        # retimed signal matches the clean one (residual = the shared
        # cubic-interpolator error + the linear interp of the impairment
        # model itself + additive noise)
        n_out = y.shape[0]
        xc = np.asarray(x)[:n_out]
        err = np.mean(np.abs(np.asarray(y)[64:-64] - xc[64:-64]) ** 2)
        assert err < 0.03, (rolloff, err)
        # control: without correction the offset signal drifts far off
        err0 = np.mean(np.abs(np.asarray(x_off)[64:n_out - 64]
                              - xc[64:-64]) ** 2)
        assert err0 > 5 * err, (err0, err)


def test_ffw_clock_recovery_pwl_tracks_varying_drift():
    """fit='pwl' follows a clock whose offset CHANGES over the record
    (thermal drift model) — the global linear fit cannot."""
    from opticommpy_tpu.dsp import FFWClockRecoveryConfig, ffw_clock_recovery

    rng = np.random.default_rng(11)
    x = _ffw_test_signal(rng, 2**15, 0.1)
    n = x.shape[0]
    # time-varying clock: offset ramps 0 -> 300 ppm across the record
    # (implemented as a quadratic timing offset)
    i = np.arange(n)
    t_warp = i + (150e-6 / n) * i.astype(np.float64) ** 2
    xr = np.asarray(x)
    y_off = np.stack(
        [np.interp(t_warp, i, xr[:, m].real) + 1j * np.interp(t_warp, i, xr[:, m].imag)
         for m in range(2)], axis=1).astype(np.complex64)

    errs = {}
    for fit in ("linear", "pwl"):
        cfg = FFWClockRecoveryConfig(rollOff=0.1, fit=fit)
        y = jax.jit(lambda s: ffw_clock_recovery(s, cfg))(jnp.asarray(y_off))
        n_out = y.shape[0]
        errs[fit] = np.mean(
            np.abs(np.asarray(y)[64:-64] - xr[:n_out][64:-64]) ** 2)
    assert errs["pwl"] < 0.5 * errs["linear"], errs


def test_ffw_clock_recovery_at_4sps():
    """The estimator generalizes over the oversampling factor: at 4 SpS
    the symbol-rate line sits at fs/4 (no Nyquist degeneracy, but the
    same single-sided band-edge sum applies) and the corrected signal
    matches the clean 4-SpS waveform."""
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp import FFWClockRecoveryConfig, ffw_clock_recovery

    rng = np.random.default_rng(21)
    n_sym, sps = 2**14, 4
    const = gray_mapping(16, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)
    sym = const[rng.integers(0, 16, size=(n_sym, 2))]
    pulse = jnp.asarray(pulse_shape("rrc", sps, 1025, 0.1).astype(np.float32))
    x = pnorm(fir_filter(pulse, upsample(jnp.asarray(sym), sps)))
    x = x + (0.05 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))).astype(np.complex64)
    ppm_true = 150.0
    x_off = clock_sampling_interp(x, 4.0, 4.0 * (1 + ppm_true * 1e-6))
    cfg = FFWClockRecoveryConfig(rollOff=0.1, sps=4)
    y, (ppm_est, _) = jax.jit(
        lambda s: ffw_clock_recovery(s, cfg, return_est=True))(x_off)
    assert abs(float(ppm_est) - ppm_true) < 3.0, float(ppm_est)
    n_out = y.shape[0]
    xc = np.asarray(x)[:n_out]
    err = np.mean(np.abs(np.asarray(y)[64:-64] - xc[64:-64]) ** 2)
    assert err < 0.03, err
