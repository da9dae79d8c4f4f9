"""Tests for Pallas TPU kernels (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm.modulation import gray_mapping
from opticommpy_tpu.dsp import bps
from opticommpy_tpu.kernels.bps_pallas import bps_pallas
from opticommpy_tpu.ops import gaussian_complex_noise, phase_noise, pnorm
from opticommpy_tpu.comm import modulate_gray


def _test_signal(n=3000, M=16, snr_db=22.0, lw_ts=2e-6, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=n * int(np.log2(M)))
    tx = pnorm(modulate_gray(jnp.asarray(bits), M, "qam"))
    phi = phase_noise(k1, lw_ts, n, 1.0)
    noise = gaussian_complex_noise(k2, (n,), 10 ** (-snr_db / 10))
    return tx * jnp.exp(1j * phi) + noise, phi


def test_bps_pallas_matches_xla_reference():
    sig, _ = _test_signal()
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    est_xla = np.asarray(bps(sig, 16, const, 64))
    est_pl = np.asarray(bps_pallas(sig, 16, const, 64, block=256, interpret=True))
    # identical argmin decisions except possible f32 near-ties
    mismatch = np.mean(est_xla != est_pl)
    assert mismatch < 0.01, f"mismatch rate {mismatch}"


def test_bps_pallas_tracks_phase():
    sig, phi = _test_signal(seed=1)
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    est = np.asarray(bps_pallas(sig, 16, const, 64, block=512, interpret=True))
    err = np.angle(np.exp(1j * 4 * (est + np.asarray(phi)))) / 4
    assert np.std(err[200:-200]) < 0.05


def test_bps_pallas_two_modes_and_odd_sizes():
    s1, _ = _test_signal(n=1111, seed=2)
    s2, _ = _test_signal(n=1111, seed=3)
    sig = jnp.stack([s1, s2], axis=1)
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    est = bps_pallas(sig, 8, const, 32, block=128, interpret=True)
    assert est.shape == (1111, 2)
    ref = bps(sig, 8, const, 32)
    assert np.mean(np.asarray(est) != np.asarray(ref)) < 0.02


def test_bps_pallas_nonsquare_constellation():
    """PSK has no square grid -> exercises the unrolled M-point min path."""
    rng = np.random.default_rng(4)
    n = 1500
    bits = rng.integers(0, 2, size=n * 3)
    tx = pnorm(modulate_gray(jnp.asarray(bits), 8, "psk"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    phi = phase_noise(k1, 1e-6, n, 1.0)
    sig = tx * jnp.exp(1j * phi) + gaussian_complex_noise(k2, (n,), 10 ** -2.2)
    const = pnorm(jnp.asarray(gray_mapping(8, "psk")))
    from opticommpy_tpu.kernels.bps_pallas import _square_qam_levels
    assert _square_qam_levels(np.asarray(const.real), np.asarray(const.imag)) is None
    est = np.asarray(bps_pallas(sig, 12, const, 64, block=256, interpret=True))
    ref = np.asarray(bps(sig, 12, const, 64))
    # 8-PSK distances are pi/4-periodic in phase, so test phases pi/4 apart
    # tie exactly and argmin tie-breaks differ; compare modulo the symmetry
    d = np.angle(np.exp(1j * 8 * (est - ref))) / 8
    assert np.mean(np.abs(d) > 1e-4) < 0.02


def test_bps_pallas_three_modes_packed_plus_remainder():
    """64 phases pack 2 modes/call; 3 modes = one packed call + one single."""
    sigs = [_test_signal(n=900, seed=s)[0] for s in (5, 6, 7)]
    sig = jnp.stack(sigs, axis=1)
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    est = bps_pallas(sig, 10, const, 64, block=128, interpret=True)
    assert est.shape == (900, 3)
    ref = bps(sig, 10, const, 64)
    assert np.mean(np.asarray(est) != np.asarray(ref)) < 0.02


def test_ddpll_pallas_matches_scan():
    from opticommpy_tpu.dsp import ddpll
    from opticommpy_tpu.kernels.ddpll_pallas import ddpll_pallas

    sig, phi = _test_signal(n=2000, M=4, snr_db=25.0, lw_ts=1e-7, seed=4)
    sig2 = jnp.stack([sig, sig * jnp.exp(1j * 0.1)], axis=1)
    const = pnorm(jnp.asarray(gray_mapping(4, "qam")))
    ts = 1 / 32e9
    t1 = t2 = 1 / (2 * np.pi * 10e6)
    est_scan = np.asarray(ddpll(sig2, ts, 0.1, t1, t2, const))
    est_pl = np.asarray(ddpll_pallas(sig2, ts, 0.1, t1, t2,
                                     np.asarray(const), block=256,
                                     interpret=True))
    assert np.allclose(est_pl, est_scan, atol=2e-4)


def test_ddpll_pallas_with_pilots():
    from opticommpy_tpu.kernels.ddpll_pallas import ddpll_pallas

    sig, phi = _test_signal(n=3000, M=16, snr_db=25.0, lw_ts=1e-7, seed=5)
    const = pnorm(jnp.asarray(gray_mapping(16, "qam")))
    tx = sig * jnp.exp(-1j * jnp.asarray(phi))  # noiseless-ish reference
    ts = 1 / 32e9
    t1 = t2 = 1 / (2 * np.pi * 10e6)
    est = np.asarray(ddpll_pallas(sig, ts, 0.1, t1, t2, np.asarray(const),
                                  symb_tx=tx, pilot_ind=np.arange(0, 3000, 20),
                                  block=512, interpret=True))
    err = np.angle(np.exp(1j * 4 * (est + np.asarray(phi)))) / 4
    assert np.std(err[1000:]) < 0.08


def test_ddpll_pallas_batch_packed_columns():
    """Packing B signals on the mode axis == running each separately."""
    import numpy as np
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.kernels.ddpll_pallas import ddpll_pallas

    const = gray_mapping(4, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)
    rng = np.random.default_rng(0)
    b, n = 4, 700
    sym = const[rng.integers(0, 4, size=(n, 2 * b))]
    phase = np.cumsum(rng.normal(0, 0.01, size=(n, 1)), axis=0)
    sig = (sym * np.exp(1j * phase)).astype(np.complex64)
    ts, kv, tau1, tau2 = 1 / 32e9, 0.1, 1 / (2 * np.pi * 1e6), 1e-9
    est_packed = np.asarray(ddpll_pallas(sig, ts, kv, tau1, tau2, const,
                                         interpret=True))
    assert est_packed.shape == (n, 2 * b)
    for i in range(b):
        est_i = np.asarray(ddpll_pallas(sig[:, 2 * i:2 * i + 2], ts, kv,
                                        tau1, tau2, const, interpret=True))
        np.testing.assert_allclose(est_packed[:, 2 * i:2 * i + 2], est_i,
                                   rtol=1e-5, atol=1e-7)


def test_dfe_pallas_matches_scan():
    """Pallas DFE == scan DFE (PAM, ISI channel), single and batched."""
    import numpy as np
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import DFEConfig, dfe
    from opticommpy_tpu.kernels.dfe_pallas import dfe_pallas

    rng = np.random.default_rng(0)
    const = gray_mapping(4, "pam").real
    sym = const[rng.integers(0, 4, size=3000)].astype(np.complex64)
    h = np.array([0.15, 1.0, 0.3, -0.1], np.complex64)
    x = np.convolve(sym, h, "same") + 0.02 * rng.normal(size=sym.shape)
    cfg = DFEConfig(nTapsFF=7, nTapsFB=5, SpS=1, mu=2e-3, nTrain=1200, M=4,
                    constType="pam")
    y1, f1, b1, m1 = dfe(jnp.asarray(x), jnp.asarray(sym), cfg)
    y2, f2, b2, m2 = dfe_pallas(jnp.asarray(x), jnp.asarray(sym), cfg,
                                interpret=True)
    assert float(jnp.linalg.norm(y1 - y2) / jnp.linalg.norm(y1)) < 1e-5
    assert float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1)) < 1e-5
    # decisions converge: post-training slice tracks the normalized symbols
    from opticommpy_tpu.ops.signal import pnorm
    sym_n = np.asarray(pnorm(jnp.asarray(sym)))
    err = np.abs(np.asarray(y2[1500:3000]) - sym_n[1500:3000])
    assert np.mean(err**2) < 0.05

    # batch of two different signals == per-signal runs
    x2 = np.convolve(sym[::-1], h, "same") + 0.02 * rng.normal(size=sym.shape)
    xb = jnp.asarray(np.stack([x, x2]))
    sb = jnp.asarray(np.stack([sym, sym[::-1]]))
    yb, fb, bb, mb = dfe_pallas(xb, sb, cfg, interpret=True)
    y_single, _, _, _ = dfe_pallas(jnp.asarray(x2), jnp.asarray(sym[::-1]),
                                   cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(yb[1]), np.asarray(y_single),
                               rtol=1e-5, atol=1e-6)


def test_dfe_pallas_fulltime_and_qam():
    import numpy as np
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import DFEConfig, dfe
    from opticommpy_tpu.kernels.dfe_pallas import dfe_pallas

    rng = np.random.default_rng(1)
    const = gray_mapping(4, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)
    sym = const[rng.integers(0, 4, size=2000)]
    h = np.array([0.1 + 0.05j, 1.0, 0.2 - 0.1j], np.complex64)
    x = np.convolve(sym, h, "same") + 0.02 * (
        rng.normal(size=sym.shape) + 1j * rng.normal(size=sym.shape))
    cfg = DFEConfig(nTapsFF=7, nTapsFB=3, SpS=1, mu=2e-3, nTrain=800, M=4,
                    constType="qam", trainingMode="fulltime")
    y1, f1, _, _ = dfe(jnp.asarray(x), jnp.asarray(sym), cfg)
    y2, f2, _, _ = dfe_pallas(jnp.asarray(x), jnp.asarray(sym), cfg,
                              interpret=True)
    assert float(jnp.linalg.norm(y1 - y2) / jnp.linalg.norm(y1)) < 1e-5


def test_ffe_pallas_matches_scan():
    import numpy as np
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import FFEConfig, ffe
    from opticommpy_tpu.kernels.dfe_pallas import ffe_pallas

    rng = np.random.default_rng(2)
    const = gray_mapping(4, "pam").real
    sym = const[rng.integers(0, 4, size=2500)].astype(np.complex64)
    h = np.array([0.2, 1.0, 0.25], np.complex64)
    x = np.convolve(sym, h, "same") + 0.02 * rng.normal(size=sym.shape)
    cfg = FFEConfig(nTaps=9, SpS=1, mu=2e-3, nTrain=1000, M=4,
                    constType="pam")
    y1, f1, m1 = ffe(jnp.asarray(x), jnp.asarray(sym), cfg)
    y2, f2, m2 = ffe_pallas(jnp.asarray(x), jnp.asarray(sym), cfg,
                            interpret=True)
    assert float(jnp.linalg.norm(y1 - y2) / jnp.linalg.norm(y1)) < 1e-5
    assert float(jnp.linalg.norm(f1 - f2) / jnp.linalg.norm(f1)) < 1e-5
    # batch path: 2 rows
    yb, fb, mb = ffe_pallas(jnp.asarray(np.stack([x, x])),
                            jnp.asarray(np.stack([sym, sym])), cfg,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)


def test_ldpc_check_update_pallas_bit_identical():
    """The fused LDPC check-update kernel == the XLA slab chain, bit for
    bit (f32 and bf16, plain and normalized min-sum), masked slot incl."""
    import numpy as np

    from opticommpy_tpu.comm import fec_qc
    from opticommpy_tpu.kernels.ldpc_pallas import check_update_msa_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(18, 2, 360, 128)).astype(np.float32))
    for cast in (lambda a: a, lambda a: a.astype(jnp.bfloat16)):
        xj = cast(x).at[17, 0, 0].set(jnp.inf)  # no p_{-1} at check 0
        for alpha in (None, 0.75):
            ref = fec_qc._check_msa_slots(xj)
            if alpha is not None:
                ref = (alpha * ref.astype(jnp.float32)).astype(xj.dtype)
            out = check_update_msa_pallas(xj, alpha, interpret=True)
            assert out.dtype == xj.dtype
            assert bool(jnp.all(ref == out))


def test_volterra_pallas_matches_scan():
    """Volterra Pallas kernel (VERDICT r2 item 8): VMEM-recurrence kernel
    equals the XLA scan for the 3rd-order PAM equalizer; batch rows are
    independent and bit-match the single-signal call."""
    from opticommpy_tpu.dsp.equalization import VolterraConfig, volterra
    from opticommpy_tpu.kernels.volterra_pallas import volterra_pallas

    rng = np.random.default_rng(4)
    n_sym, sps = 1200, 2
    sym = (2 * rng.integers(0, 4, size=n_sym) - 3).astype(np.float32)
    sig = np.repeat(sym, sps) + 0.1 * rng.normal(size=n_sym * sps)
    sig = (sig + 0.05 * sig**2).astype(np.float32)
    cfg = VolterraConfig(n1Taps=13, n2Taps=7, n3Taps=5, SpS=sps, mu=1e-3,
                         nTrain=500, order=3, M=4, constType="pam")
    y0, hs0, mse0 = volterra(jnp.asarray(sig), jnp.asarray(sym), cfg)
    y1, hs1, mse1 = volterra_pallas(jnp.asarray(sig), jnp.asarray(sym),
                                    cfg, block=128, interpret=True)
    n = min(y0.shape[0], y1.shape[0])
    assert np.allclose(np.asarray(y0)[:n], np.asarray(y1)[:n], atol=1e-5)
    assert np.allclose(np.asarray(mse0)[:n], np.asarray(mse1)[:n],
                       atol=1e-5)
    for a, b in zip(hs0, hs1):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # batch: two different signals, row 0 == single-signal result
    # (note: a merely re-SCALED row would be normalized back to identical)
    sig2 = (sig + 0.05 * rng.normal(size=sig.shape)).astype(np.float32)
    yB, hsB, _ = volterra_pallas(
        jnp.asarray(np.stack([sig, sig2])),
        jnp.asarray(np.stack([sym, sym])), cfg, block=128, interpret=True)
    assert np.allclose(np.asarray(yB)[0][:n], np.asarray(y1)[:n],
                       atol=1e-6)
    assert not np.allclose(np.asarray(yB)[1][:n], np.asarray(y1)[:n])
