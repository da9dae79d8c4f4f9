"""MXU matmul-FFT kernel: exactness vs numpy FFT and SSFM backend parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from opticommpy_tpu.kernels.matmul_fft import (
    matmul_fft,
    matmul_ifft,
    plan_fft,
)


@pytest.mark.parametrize("n", [256, 768, 4096, 2**14])
def test_matmul_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    got = np.asarray(matmul_fft(x))
    ref = np.fft.fft(x)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_matmul_fft_roundtrip_batched():
    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 3, 4096)) + 1j * rng.normal(size=(2, 3, 4096))
         ).astype(np.complex64)
    r = np.asarray(matmul_ifft(matmul_fft(x)))
    assert np.max(np.abs(r - x)) / np.max(np.abs(x)) < 1e-5


def test_permuted_operator_application():
    """inv(fwd(x) * H[kmap]) == ifft(fft(x) * H): the SSFM fast path."""
    n = 4096
    plan = plan_fft(n)
    rng = np.random.default_rng(1)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    w = 2 * np.pi * np.fft.fftfreq(n)
    H = np.exp(1j * 0.05 * w**2).astype(np.complex64)
    ref = np.fft.ifft(np.fft.fft(x) * H)
    got = np.asarray(
        matmul_ifft(matmul_fft(x, plan, permuted=True) * jnp.asarray(H)[plan.kmap],
                    plan, permuted=True)
    )
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_kmap_is_permutation():
    for n in (256, 2**14):
        kmap = plan_fft(n).kmap
        assert np.array_equal(np.sort(kmap), np.arange(n))


def test_manakov_fft_backend_parity():
    """manakov_ssf(fftBackend='matmul') matches the XLA-FFT path."""
    from opticommpy_tpu.models import SSFMConfig
    from opticommpy_tpu.models.channels import manakov_ssf

    n = 2**12
    rng = np.random.default_rng(5)
    e = 0.03 * (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
                ).astype(np.complex64)
    kw = dict(Ltotal=100.0, Lspan=50.0, hz=1.0, alpha=0.2, D=16.0, gamma=1.3,
              Fs=64e9, amp="ideal", nlprMethod=False, trapIters=1,
              fusedLinear=True)
    out_x = np.asarray(manakov_ssf(e, SSFMConfig(**kw, fftBackend="xla")))
    out_m = np.asarray(manakov_ssf(e, SSFMConfig(**kw, fftBackend="matmul")))
    rel = np.max(np.abs(out_m - out_x)) / np.max(np.abs(out_x))
    assert rel < 5e-4, rel


def test_fft_backend_fallback_on_prime_length():
    """A length that won't factor into radices <= 128 falls back to XLA."""
    from opticommpy_tpu.models import SSFMConfig
    from opticommpy_tpu.models.channels import manakov_ssf

    n = 1031  # prime > 128
    rng = np.random.default_rng(9)
    e = 0.03 * (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
                ).astype(np.complex64)
    cfg = SSFMConfig(Ltotal=50.0, Lspan=50.0, hz=5.0, alpha=0.2, D=16.0,
                     gamma=1.3, Fs=64e9, amp="ideal", nlprMethod=False,
                     trapIters=1, fusedLinear=True, fftBackend="matmul")
    out = np.asarray(manakov_ssf(e, cfg))
    assert np.all(np.isfinite(out))


def test_scalar_ssfm_fused_and_matmul_backend():
    """Scalar NLSE SSFM: fused-linear path (xla & matmul FFT) matches the
    plain symmetric split-step to the splitting-order tolerance."""
    from opticommpy_tpu.models import SSFMConfig
    from opticommpy_tpu.models.channels import ssfm

    n = 2**12
    rng = np.random.default_rng(2)
    e = 0.03 * (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    kw = dict(Ltotal=100.0, Lspan=50.0, hz=0.5, alpha=0.2, D=16.0, gamma=1.3,
              Fs=64e9, amp="ideal")
    base = np.asarray(ssfm(e, SSFMConfig(**kw)))
    fused = np.asarray(ssfm(e, SSFMConfig(**kw, fusedLinear=True)))
    fused_mm = np.asarray(
        ssfm(e, SSFMConfig(**kw, fusedLinear=True, fftBackend="matmul")))
    scale = np.max(np.abs(base))
    assert np.max(np.abs(fused - base)) / scale < 5e-3  # splitting order
    assert np.max(np.abs(fused_mm - fused)) / scale < 5e-4  # FFT rounding
