"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.dsp import EDCConfig, edc
from opticommpy_tpu.models import LinearFiberConfig, SSFMConfig, linear_fiber_channel, manakov_ssf
from opticommpy_tpu.ops import fir_filter
from jax.sharding import Mesh

from opticommpy_tpu.parallel import (
    make_mesh,
    manakov_ssf_dp,
    manakov_ssf_pp,
    sharded_edc,
    sharded_fir,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(n_data=4, n_time=2)


@pytest.fixture(scope="module")
def mesh_time4():
    return make_mesh(n_data=2, n_time=4)


def test_sharded_fir_matches_single_device(mesh_time4):
    rng = np.random.default_rng(0)
    n = 4096
    x = jnp.asarray((rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))).astype(np.complex64))
    h = jnp.asarray(rng.normal(size=33).astype(np.float32))
    y_ref = fir_filter(h, x)
    y_shard = sharded_fir(x, h, mesh_time4)
    assert np.allclose(np.asarray(y_shard), np.asarray(y_ref), rtol=1e-3, atol=1e-3)


def test_sharded_fir_even_taps(mesh_time4):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2048, 1)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=32).astype(np.float32))
    y_ref = fir_filter(h, x)
    y_shard = sharded_fir(x, h, mesh_time4)
    assert np.allclose(np.asarray(y_shard), np.asarray(y_ref), rtol=1e-3, atol=1e-3)


def test_sharded_edc_inverts_cd(mesh_time4):
    fs = 64e9
    rng = np.random.default_rng(2)
    n = 2**13
    sps = 2
    sym = rng.choice([-1 - 1j, -1 + 1j, 1 - 1j, 1 + 1j], size=n // sps)
    up = np.zeros(n, dtype=complex)
    up[::sps] = sym
    h = np.sinc(np.arange(-8, 9) / 2) * np.hamming(17)
    sig = jnp.asarray(np.convolve(up, h, "same").astype(np.complex64))[:, None]
    cfg_ch = LinearFiberConfig(L=80, alpha=0.0, D=17, Fs=fs)
    disp = linear_fiber_channel(sig, cfg_ch)
    cfg_edc = EDCConfig(L=80, D=17, Fs=fs, Rs=32e9)
    rec_ref = edc(disp, cfg_edc)
    rec_shard = sharded_edc(disp, cfg_edc, mesh_time4)
    sl = slice(600, -600)
    # the sharded EDC must agree with single-device EDC up to the (small)
    # freq-sampled vs truncated-impulse filter difference ...
    err = np.mean(np.abs(np.asarray(rec_shard)[sl] - np.asarray(rec_ref)[sl]) ** 2)
    ref = np.mean(np.abs(np.asarray(rec_ref)[sl]) ** 2)
    assert err / ref < 5e-2
    # ... and, like it, actually invert the chromatic dispersion
    err0 = np.mean(np.abs(np.asarray(rec_shard)[sl] - np.asarray(sig)[sl]) ** 2)
    sig_pow_ = np.mean(np.abs(np.asarray(sig)[sl]) ** 2)
    assert err0 / sig_pow_ < 5e-2


def _bandlimited_batch(rng, n, k_signals, scale=0.03):
    sig = scale * (
        rng.normal(size=(n, 2 * k_signals)) + 1j * rng.normal(size=(n, 2 * k_signals))
    ).astype(np.complex64)
    h = np.sinc(np.arange(-16, 17) / 4)
    for c in range(sig.shape[1]):
        sig[:, c] = np.convolve(sig[:, c], h, "same")
    return jnp.asarray(sig.astype(np.complex64))


@pytest.fixture(scope="module")
def mesh_stage4():
    return Mesh(np.array(jax.devices()[:4]), ("stage",))


def test_manakov_pp_matches_single_device(mesh_stage4):
    fs = 32e9 * 4
    sig = _bandlimited_batch(np.random.default_rng(4), 2**11, 8)
    # 8 spans over 4 pipeline stages, 8 signals in 4 microbatches
    cfg = SSFMConfig(Ltotal=8 * 25, Lspan=25, hz=5.0, alpha=0.2, D=16,
                     gamma=1.3, Fs=fs, amp="ideal", nlprMethod=False)
    key = jax.random.PRNGKey(0)
    out_single = manakov_ssf(sig, cfg, key)
    out_pp = manakov_ssf_pp(sig, cfg, key, mesh_stage4, n_microbatches=4)
    assert np.allclose(np.asarray(out_pp), np.asarray(out_single), rtol=1e-3, atol=2e-4)


def test_manakov_pp_adaptive_step(mesh_stage4):
    fs = 32e9 * 4
    sig = _bandlimited_batch(np.random.default_rng(5), 2**10, 4)
    cfg = SSFMConfig(Ltotal=4 * 25, Lspan=25, alpha=0.2, D=16, gamma=1.3,
                     Fs=fs, amp="ideal", nlprMethod=True, maxNlinPhaseRot=2e-2)
    key = jax.random.PRNGKey(1)
    out_single = manakov_ssf(sig, cfg, key)
    out_pp = manakov_ssf_pp(sig, cfg, key, mesh_stage4)  # M defaults to S=4
    assert np.allclose(np.asarray(out_pp), np.asarray(out_single), rtol=1e-3, atol=2e-4)


def test_manakov_pp_edfa_power(mesh_stage4):
    """ASE path: pp output power stays near the (gain-balanced) input power."""
    fs = 32e9 * 4
    sig = _bandlimited_batch(np.random.default_rng(6), 2**10, 4, scale=0.05)
    cfg = SSFMConfig(Ltotal=4 * 25, Lspan=25, hz=5.0, alpha=0.2, D=16,
                     gamma=1.3, Fs=fs, amp="edfa", nlprMethod=False)
    out_pp = manakov_ssf_pp(sig, cfg, jax.random.PRNGKey(2), mesh_stage4)
    p_in = float(jnp.mean(jnp.abs(sig) ** 2))
    p_out = float(jnp.mean(jnp.abs(out_pp) ** 2))
    assert 0.8 * p_in < p_out < 1.6 * p_in  # gain-balanced + a little ASE


def test_manakov_dp_matches_single_device(mesh8):
    fs = 32e9 * 4
    rng = np.random.default_rng(3)
    n = 2**11
    k_signals = 4  # one per data-axis device
    sig = 0.03 * (
        rng.normal(size=(n, 2 * k_signals)) + 1j * rng.normal(size=(n, 2 * k_signals))
    ).astype(np.complex64)
    # bandlimit
    h = np.sinc(np.arange(-16, 17) / 4)
    for c in range(sig.shape[1]):
        sig[:, c] = np.convolve(sig[:, c], h, "same")
    sig = jnp.asarray(sig.astype(np.complex64))
    cfg = SSFMConfig(Ltotal=50, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                     amp="none", nlprMethod=True, maxNlinPhaseRot=2e-2)
    key = jax.random.PRNGKey(0)
    out_single = manakov_ssf(sig, cfg, key)
    out_dp = manakov_ssf_dp(sig, cfg, key, mesh8)
    assert np.allclose(np.asarray(out_dp), np.asarray(out_single), rtol=1e-3, atol=2e-4)
