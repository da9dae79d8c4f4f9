"""Sharded compute paths: data-parallel SSFM, time-sharded filtering.

TPU-native scaling of the two structures the reference already exposes
(SURVEY.md §2.3):

- **Data parallelism** (``shard_batch``/:func:`manakov_ssf_dp`): the SSFM
  batch axis (WDM channels / launch powers / MC seeds) is sharded over the
  mesh ``data`` axis. No collectives are needed during propagation — each
  chip integrates its own fields; XLA inserts any gathers only at the edges.
- **Sequence (time) parallelism** (:func:`sharded_fir` /
  :func:`sharded_edc`): the time axis is sharded over the mesh ``time``
  axis; each chip filters its chunk after receiving K-1 halo samples from
  its neighbors via ``lax.ppermute`` (ICI). This is the distributed form of
  the reference's overlap-save decomposition (core.py:973).

Both compose in one mesh: ``Mesh((data, time))``.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from opticommpy_tpu.models.channels import manakov_ssf
from opticommpy_tpu.ops.filtering import _fft_conv_same

__all__ = ["sharded_fir", "sharded_edc", "manakov_ssf_dp", "shard_batch"]


def _halo_exchange(x_local, halo_left, halo_right, axis_name):
    """Gather halo samples from both neighbors along ``axis_name``.

    Devices at the chain ends receive zeros (ppermute drops edge links), which
    matches the zero-padded boundary semantics of overlap-save filtering.
    """
    n_dev = jax.lax.axis_size(axis_name)
    # send my tail to my right neighbor (their left halo)
    perm_r = [(i, i + 1) for i in range(n_dev - 1)]
    left = jax.lax.ppermute(x_local[-halo_left:], axis_name, perm_r)
    # send my head to my left neighbor (their right halo)
    perm_l = [(i + 1, i) for i in range(n_dev - 1)]
    right = jax.lax.ppermute(x_local[:halo_right], axis_name, perm_l)
    return jnp.concatenate([left, x_local, right], axis=0)


def sharded_fir(x, h, mesh, time_axis="time", mode_axis=None):
    """'same'-mode FIR filtering with the time axis sharded across chips.

    Each chip receives (K-1)//2 halo samples from each neighbor over ICI and
    filters its local chunk — the distributed overlap-save of core.py:973.

    Parameters
    ----------
    x : (N, modes) array — N must be divisible by the mesh's time-axis size.
    h : (K,) filter taps.
    mesh : jax.sharding.Mesh with a ``time_axis`` axis.
    mode_axis : optional mesh axis sharding the mode/signal column axis as
        well (keeps a batch-sharded upstream stage's layout, so entering the
        time-sharded stage is a local slice instead of an all-gather).
    """
    x = jnp.asarray(x)
    h = jnp.asarray(h)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    k = h.shape[0]
    # 'same' output at position i uses x[i - k//2 .. i + (k-1)//2]
    halo_l = k // 2
    halo_r = (k - 1) // 2
    out_dtype = (
        jnp.complex64
        if (jnp.issubdtype(x.dtype, jnp.complexfloating)
            or jnp.issubdtype(h.dtype, jnp.complexfloating))
        else jnp.float32
    )

    def local_filter(x_local, h_):
        xx = _halo_exchange(x_local, halo_l, halo_r, time_axis)
        y = _fft_conv_same(h_, xx, out_dtype)
        return y[halo_l : xx.shape[0] - halo_r]

    spec_in = P(time_axis, mode_axis)
    fn = jax.shard_map(
        local_filter,
        mesh=mesh,
        in_specs=(spec_in, P()),
        out_specs=spec_in,
    )
    y = fn(x, h)
    return y[:, 0] if squeeze else y


def sharded_edc(sig, config, mesh, time_axis="time", mode_axis=None):
    """Chromatic-dispersion compensation with a sharded time axis.

    Same filter as :func:`opticommpy_tpu.dsp.equalization.edc`, applied with
    :func:`sharded_fir` halos (the CD impulse response is converted from its
    frequency-domain definition once, host-side).
    """
    from opticommpy_tpu.models.channels import fiber_coefficients

    _, beta2 = fiber_coefficients(0.0, config.D, config.Fc)
    n_coeffs = config.NfilterCoeffs
    if n_coeffs is None:
        n_coeffs = int(
            2 * np.ceil(6.67 * abs(beta2) * config.L * config.Rs**2
                        * (config.Fs / config.Rs))
        )
    w = 2 * np.pi * config.Fs * np.fft.fftfreq(n_coeffs)
    H = np.exp(-1j * (beta2 / 2) * (w**2) * config.L)
    h_t = np.fft.fftshift(np.fft.ifft(H)).astype(np.complex64)
    if n_coeffs % 2 == 0:
        # fftshift centers an even-length impulse at k//2; shift one sample so
        # the zero-delay tap sits at (k-1)//2, the 'same'-convolution center
        h_t = np.concatenate([h_t[1:], [0.0]]).astype(np.complex64)
    return sharded_fir(sig, jnp.asarray(h_t), mesh, time_axis, mode_axis)


def shard_batch(mesh, data_axis="data"):
    """Sharding for the (N, 2k) interleaved-polarization signal layout.

    Shards the column axis: contiguous blocks of even size keep each signal's
    x/y polarization pair on the same chip.
    """
    return NamedSharding(mesh, P(None, data_axis))


def manakov_ssf_dp(e_in, config, key, mesh, data_axis="data"):
    """Data-parallel Manakov SSFM: batch signals sharded over chips.

    ``e_in`` is (N, 2k) with k signals; k must be divisible by the mesh's
    data-axis size. With ``nlprMethod=False`` (fixed step) propagation needs
    no inter-chip communication; with the adaptive step-size rule the global
    ``max(phi_rot)`` becomes one scalar all-reduce per z-step (all chips take
    lockstep steps, matching the single-device semantics exactly).
    """
    sharding = shard_batch(mesh, data_axis)
    e_in = jax.device_put(jnp.asarray(e_in), sharding)
    fn = jax.jit(
        lambda e, k: manakov_ssf(e, config, k),
        in_shardings=(sharding, None),
        out_shardings=sharding,
    )
    return fn(e_in, key)
