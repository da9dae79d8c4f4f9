"""Tests for equalization — EDC inverse-channel closures and adaptive EQ convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import modulate_gray
from opticommpy_tpu.dsp import (
    DFEConfig,
    EDCConfig,
    FFEConfig,
    MIMOEqualizerConfig,
    dfe,
    edc,
    ffe,
    manakov_dbp,
    mimo_adapt_equalizer,
)
from opticommpy_tpu.models import LinearFiberConfig, SSFMConfig, linear_fiber_channel, manakov_ssf
from opticommpy_tpu.ops import fir_filter, pnorm, pulse_shape, sig_pow, upsample


def _qam_signal(key, n_sym, sps, modes=1, m=16, n_taps=512, rolloff=0.1):
    symb = modulate_gray(
        jax.random.randint(key, (n_sym * int(np.log2(m)) * modes,), 0, 2), m, "qam"
    ).reshape(n_sym, modes)
    symb = pnorm(symb)
    pulse = jnp.asarray(pulse_shape("rrc", sps, n_taps, rolloff))
    sig = fir_filter(pulse, upsample(symb, sps))
    return sig, symb


def test_edc_inverts_linear_fiber_cd():
    # reference tests/test_channels.py:107-151: CD then EDC restores signal
    fs = 32e9 * 2
    key = jax.random.PRNGKey(0)
    sig, _ = _qam_signal(key, 4096, 2)
    cfg_ch = LinearFiberConfig(L=100, alpha=0.0, D=17, Fs=fs)
    disp = linear_fiber_channel(sig, cfg_ch)
    rec = edc(disp, EDCConfig(L=100, D=17, Fs=fs, Rs=32e9))
    sl = slice(500, -500)
    err = np.mean(np.abs(np.asarray(rec)[sl] - np.asarray(sig)[sl]) ** 2)
    ref = np.mean(np.abs(np.asarray(sig)[sl]) ** 2)
    assert err / ref < 1e-2


def test_mimo_nlms_converges_identity_channel():
    key = jax.random.PRNGKey(1)
    sps = 2
    sig, symb = _qam_signal(key, 6000, sps, modes=2)
    cfg = MIMOEqualizerConfig(nTaps=7, mu=(2e-3,), SpS=sps, alg=("nlms",), M=16)
    y, H, H_, err_sq, _ = mimo_adapt_equalizer(
        pnorm(sig), cfg, symb_ref=symb, return_results=True
    )
    # after convergence the tail error should be small (residual ISI from the
    # un-matched RRC with a short equalizer dominates)
    tail = np.asarray(err_sq.real)[:, -1000:]
    head = np.asarray(err_sq.real)[:, 100:300]
    assert np.mean(tail) < 2e-2
    assert np.mean(tail) < 0.5 * np.mean(head)  # error decreased materially


def test_mimo_cma_undoes_polarization_mixing():
    key = jax.random.PRNGKey(2)
    sps = 2
    sig, symb = _qam_signal(key, 12000, sps, modes=2, m=4)
    # static unitary polarization rotation
    theta = 0.4
    J = jnp.array(
        [[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]],
        dtype=jnp.complex64,
    )
    mixed = sig @ J.T
    cfg = MIMOEqualizerConfig(
        nTaps=5, mu=(2e-3, 1e-3), SpS=sps, alg=("cma", "dd-lms"), M=4,
        L=(6000, 6000),
    )
    y = mimo_adapt_equalizer(pnorm(mixed), cfg, symb_ref=symb)
    # constant-modulus convergence: modulus error should shrink
    tail = np.asarray(y)[-3000:]
    mod_err = np.mean(np.abs(np.abs(tail) - 1.0) ** 2)
    assert mod_err < 0.02


def test_mimo_rls_converges_fast():
    key = jax.random.PRNGKey(3)
    sps = 2
    sig, symb = _qam_signal(key, 4000, sps, modes=1)
    cfg = MIMOEqualizerConfig(nTaps=7, SpS=sps, alg=("rls",), lambdaRLS=0.999, M=16)
    y, H, H_, err_sq, _ = mimo_adapt_equalizer(
        pnorm(sig), cfg, symb_ref=symb, return_results=True
    )
    assert np.mean(np.asarray(err_sq.real)[:, -500:]) < 5e-3


def test_manakov_dbp_inverts_nonlinear_propagation():
    fs = 32e9 * 8
    key = jax.random.PRNGKey(4)
    rng = np.random.default_rng(5)
    # bandlimited dual-pol signal
    n = 2**13
    sps = 8
    n_sym = n // sps
    s = rng.choice([-1 - 1j, -1 + 1j, 1 - 1j, 1 + 1j], size=(n_sym, 2))
    up = np.zeros((n, 2), dtype=complex)
    up[::sps] = s
    h = np.sinc(np.arange(-4 * sps, 4 * sps + 1) / sps)
    sig = np.stack([np.convolve(up[:, k], h, "same") for k in range(2)], axis=1)
    sig = jnp.asarray(0.05 * sig.astype(np.complex64))

    cfg = SSFMConfig(Ltotal=100, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                     amp="ideal", nlprMethod=True, maxNlinPhaseRot=2e-3)
    prop = manakov_ssf(sig, cfg)
    rec = manakov_dbp(prop, cfg)
    sl = slice(200, -200)
    err = np.mean(np.abs(np.asarray(rec)[sl] - np.asarray(sig)[sl]) ** 2)
    ref = np.mean(np.abs(np.asarray(sig)[sl]) ** 2)
    assert err / ref < 1e-3


def test_ffe_equalizes_isi_channel():
    key = jax.random.PRNGKey(6)
    rng = np.random.default_rng(7)
    const = np.array([-3.0, -1.0, 1.0, 3.0]) / np.sqrt(5)
    n = 12000
    symb = const[rng.integers(0, 4, size=n)]
    h_ch = np.array([0.15, 1.0, 0.25])
    rx = np.convolve(symb, h_ch, "same") + 0.01 * rng.normal(size=n)
    cfg = FFEConfig(nTaps=11, mu=1e-3, nTrain=4000, M=4, constType="pam")
    y, f, mse = ffe(jnp.asarray(rx), jnp.asarray(symb), cfg)
    assert np.mean(np.asarray(mse)[-2000:]) < 0.02


def test_dfe_beats_ffe_on_deep_isi():
    key = jax.random.PRNGKey(8)
    rng = np.random.default_rng(9)
    const = np.array([-1.0, 1.0])
    n = 12000
    symb = const[rng.integers(0, 2, size=n)]
    h_ch = np.array([1.0, 0.6])
    rx = np.convolve(symb, h_ch)[:n] + 0.02 * rng.normal(size=n)
    cfg_dfe = DFEConfig(nTapsFF=9, nTapsFB=4, mu=2e-3, nTrain=5000, M=2,
                        constType="pam", trainingMode="fulltime")
    y_dfe, f, b, mse_dfe = dfe(jnp.asarray(rx), jnp.asarray(symb), cfg_dfe)
    cfg_ffe = FFEConfig(nTaps=9, mu=2e-3, nTrain=5000, M=2, constType="pam",
                        trainingMode="fulltime")
    y_ffe, _, mse_ffe = ffe(jnp.asarray(rx), jnp.asarray(symb), cfg_ffe)
    assert np.mean(np.asarray(mse_dfe)[-2000:]) < np.mean(np.asarray(mse_ffe)[-2000:])


def test_mimo_apply_matches_static_algorithm():
    from opticommpy_tpu.dsp.equalization import mimo_apply

    key = jax.random.PRNGKey(10)
    sps = 2
    sig, symb = _qam_signal(key, 5000, sps, modes=2)
    x = pnorm(sig)
    cfg_train = MIMOEqualizerConfig(nTaps=7, mu=(2e-3,), SpS=sps, alg=("nlms",),
                                    M=16)
    _, H, _, _, _ = mimo_adapt_equalizer(x, cfg_train, symb_ref=symb,
                                         return_results=True)
    # applying frozen taps == running the 'static' algorithm
    cfg_static = MIMOEqualizerConfig(nTaps=7, SpS=sps, alg=("static",), M=16)
    y_static = mimo_adapt_equalizer(x, cfg_static, symb_ref=symb, H=H)
    y_apply = mimo_apply(H, x, sps)
    n = min(y_static.shape[0], y_apply.shape[0])
    assert np.allclose(np.asarray(y_apply)[:n], np.asarray(y_static)[:n],
                       atol=1e-5)


def test_mimo_block_update_converges_like_per_symbol():
    key = jax.random.PRNGKey(11)
    sps = 2
    sig, symb = _qam_signal(key, 8000, sps, modes=2)
    x = pnorm(sig)
    # per-symbol
    cfg1 = MIMOEqualizerConfig(nTaps=7, mu=(2e-3,), SpS=sps, alg=("nlms",), M=16)
    _, H1, _, e1, _ = mimo_adapt_equalizer(x, cfg1, symb_ref=symb,
                                           return_results=True)
    # block-parallel (K=16, same effective adaptation budget)
    cfg2 = MIMOEqualizerConfig(nTaps=7, mu=(2e-3,), SpS=sps, alg=("nlms",),
                               M=16, blockUpdate=16)
    y2, H2, _, e2, _ = mimo_adapt_equalizer(x, cfg2, symb_ref=symb,
                                            return_results=True)
    tail1 = float(np.mean(np.asarray(e1.real)[:, -1000:]))
    tail2 = float(np.mean(np.asarray(e2.real)[:, -1000:]))
    assert tail2 < 2 * tail1 + 5e-3, (tail1, tail2)
    assert y2.shape[0] == 8000


def test_mimo_block_update_cma():
    key = jax.random.PRNGKey(12)
    sps = 2
    sig, symb = _qam_signal(key, 12000, sps, modes=2, m=4)
    theta = 0.3
    J = jnp.array([[np.cos(theta), np.sin(theta)],
                   [-np.sin(theta), np.cos(theta)]], dtype=jnp.complex64)
    mixed = pnorm(sig @ J.T)
    cfg = MIMOEqualizerConfig(nTaps=5, mu=(1e-3,), SpS=sps, alg=("cma",), M=4,
                              blockUpdate=8)
    y = mimo_adapt_equalizer(mixed, cfg, symb_ref=symb)
    tail = np.asarray(y)[-3000:]
    assert np.mean(np.abs(np.abs(tail) - 1.0) ** 2) < 0.03


def test_mimo_apply_fused_matches_staged_chain():
    """Fused MF+EDC+pnorm+MIMO == the staged composition (interior symbols)."""
    import numpy as np
    from opticommpy_tpu.dsp.equalization import (
        EDCConfig, edc, mimo_apply, mimo_apply_fused,
    )
    from opticommpy_tpu.ops.filtering import fir_filter, pulse_shape
    from opticommpy_tpu.ops.signal import pnorm

    rng = np.random.default_rng(0)
    sps, rs = 2, 32e9
    n = 2**13
    sig = (0.2 * (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2)))
           ).astype(np.complex64)
    pulse = pulse_shape("rrc", sps, 128, 0.1).astype(np.float32)
    cfg = EDCConfig(L=100, D=16, Fs=rs * sps, Rs=rs)
    H = (0.1 * (rng.normal(size=(2, 2, 15)) + 1j * rng.normal(size=(2, 2, 15)))
         ).astype(np.complex64)
    H[0, 0, 7] += 1
    H[1, 1, 7] += 1

    x = fir_filter(jnp.asarray(pulse), jnp.asarray(sig))
    x = edc(x, cfg)
    s = float(jnp.sqrt(jnp.mean((x * jnp.conj(x)).real)))
    y_staged = np.asarray(mimo_apply(jnp.asarray(H), pnorm(x), sps))

    y_exact = np.asarray(mimo_apply_fused(
        jnp.asarray(H), jnp.asarray(sig), sps, pre=pulse, edc_config=cfg,
        scale=s))
    y_parseval = np.asarray(mimo_apply_fused(
        jnp.asarray(H), jnp.asarray(sig), sps, pre=pulse, edc_config=cfg))

    # edge symbols (within the front tap window / conv tail) carry the
    # documented zero-padding semantic difference; the interior matches
    lo, hi = 16, y_staged.shape[0] - (pulse.shape[0] + 300) // sps
    err = (np.linalg.norm(y_exact[lo:hi] - y_staged[lo:hi])
           / np.linalg.norm(y_staged[lo:hi]))
    assert err < 3e-4, err  # c64 long-FFT reordering noise
    # Parseval scale differs by O(K/N) from the staged pnorm window
    errp = (np.linalg.norm(y_parseval[lo:hi] - y_staged[lo:hi])
            / np.linalg.norm(y_staged[lo:hi]))
    assert errp < 1e-2, errp


def test_mimo_apply_fused_no_prefilter_equals_mimo_apply():
    import numpy as np
    from opticommpy_tpu.dsp.equalization import mimo_apply, mimo_apply_fused

    rng = np.random.default_rng(1)
    sig = (rng.normal(size=(2**11, 2)) + 1j * rng.normal(size=(2**11, 2))
           ).astype(np.complex64)
    H = (0.2 * (rng.normal(size=(2, 2, 15)) + 1j * rng.normal(size=(2, 2, 15)))
         ).astype(np.complex64)
    y = np.asarray(mimo_apply(jnp.asarray(H), jnp.asarray(sig), 2))
    f = np.asarray(mimo_apply_fused(jnp.asarray(H), jnp.asarray(sig), 2,
                                    scale=1.0))
    assert np.linalg.norm(f - y) / np.linalg.norm(y) < 1e-5
