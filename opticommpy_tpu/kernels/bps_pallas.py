"""Pallas TPU kernel for blind phase search (BPS) carrier recovery.

The XLA formulation of BPS (opticommpy_tpu.dsp.carrier_recovery.bps)
materializes the (N, B) minimum-distance tensor in HBM between the distance
reduction and the sliding-window sum — two full HBM round trips of a tensor
B=64x the signal size. This kernel fuses the whole pipeline in VMEM per
block of symbols:

  1. rotate the block by all B test phases (outer product; lanes = B),
  2. reduce the minimum constellation distance — a closed-form per-axis
     quantization for square QAM (O(1) instead of O(M)), an unrolled min
     over M otherwise,
  3. sliding-window sum over the symbol axis as a banded-ones matmul on the
     MXU (windows of 2*n_half+1 on a halo-extended block),
  4. argmin over the lane axis -> per-symbol phase index.

Lane packing: when 2*n_phases <= 128 both polarizations ride one kernel
call with mode m's phases occupying lanes [m*B, (m+1)*B) — full VPU/MXU
lane width and a single pallas_call for the polmux case (measured ~3x over
the one-mode-per-call layout on v5e).

Complex values travel as separate real/imag float32 planes (TPU Pallas has
no complex dtype). Halos are provided by pre-gathering overlapping windows
host-side (a ~2*halo/block size overhead, far below the B-fold dmin tensor).
Use ``interpret=True`` to run/test on CPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from opticommpy_tpu.kernels._util import split_ri

__all__ = ["bps_pallas"]


def _square_qam_levels(c_re, c_im, tol=1e-5):
    """(lo, step, L) if the constellation is a uniform square grid, else None."""
    re = np.unique(np.round(np.asarray(c_re) / tol) * tol)
    im = np.unique(np.round(np.asarray(c_im) / tol) * tol)
    if len(re) != len(im) or len(re) < 2:
        return None
    if len(re) * len(im) != len(np.asarray(c_re)):
        return None
    steps = np.diff(re)
    if not (np.allclose(re, im, atol=tol) and np.allclose(steps, steps[0], atol=tol)):
        return None
    # every (re, im) combination must be present
    pts = {(round(float(a) / tol), round(float(b) / tol))
           for a, b in zip(np.asarray(c_re), np.asarray(c_im))}
    if len(pts) != len(re) * len(im):
        return None
    return float(re[0]), float(steps[0]), int(len(re))


def _min_dist(z_re, z_im, cr_ref, ci_ref, m_const, qam_grid):
    """Minimum squared constellation distance per (symbol, lane)."""
    if qam_grid is not None:
        lo, step, n_lev = qam_grid
        # square grid: the nearest point factorizes per axis -> quantize
        def q(x):
            k = jnp.clip(jnp.round((x - lo) / step), 0.0, n_lev - 1.0)
            return k * step + lo

        dr = z_re - q(z_re)
        di = z_im - q(z_im)
        return dr * dr + di * di

    dmin = jnp.full(z_re.shape, jnp.inf, dtype=jnp.float32)
    for m in range(m_const):
        dr = z_re - cr_ref[0, m]
        di = z_im - ci_ref[0, m]
        dmin = jnp.minimum(dmin, dr * dr + di * di)
    return dmin


def _bps_kernel(sig_re_ref, sig_im_ref, rot_re_ref, rot_im_ref,
                cr_ref, ci_ref, out_ref, *, block, halo, m_const, n_phases,
                n_pack, qam_grid):
    """One grid step: phase indices for `block` symbols x n_pack modes."""
    t_ext = block + 2 * halo
    lanes = n_pack * n_phases
    r_re = rot_re_ref[:]  # (1, lanes): phases tiled n_pack times
    r_im = rot_im_ref[:]

    # signal per lane: mode m occupies lanes [m*B, (m+1)*B)
    if n_pack == 1:
        s_re = sig_re_ref[0, :, 0:1]  # (T, 1) broadcasts over lanes
        s_im = sig_im_ref[0, :, 0:1]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (t_ext, lanes), 1)
        s_re = sig_re_ref[0, :, 0:1]
        s_im = sig_im_ref[0, :, 0:1]
        for m in range(1, n_pack):
            sel = lane >= m * n_phases
            s_re = jnp.where(sel, sig_re_ref[0, :, m:m + 1], s_re)
            s_im = jnp.where(sel, sig_im_ref[0, :, m:m + 1], s_im)

    # rotated signal z = s * rot (complex outer product) -> (T, lanes).
    # Broadcast multiply on the VPU (full f32); an MXU dot would round the
    # operands to bf16 and corrupt the distance comparison.
    z_re = s_re * r_re - s_im * r_im
    z_im = s_re * r_im + s_im * r_re

    dmin = _min_dist(z_re, z_im, cr_ref, ci_ref, m_const, qam_grid)

    # sliding-window sum: W[t, s] = 1 for s in [t, t + 2*halo], an MXU matmul.
    # HIGHEST precision keeps the f32 mantissa (default MXU f32 rounds inputs
    # to bf16, which flips argmin decisions between near-tied test phases).
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, t_ext), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, t_ext), 1)
    win_mask = ((cols >= rows) & (cols <= rows + 2 * halo)).astype(jnp.float32)
    sums = jnp.dot(
        win_mask, dmin, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (block, lanes)

    if n_pack == 1:
        out_ref[0, :, :] = jnp.argmin(sums, axis=1, keepdims=True).astype(jnp.int32)
    else:
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (block, lanes), 1)
        cols_out = []
        for m in range(n_pack):
            in_mode = (lane_b >= m * n_phases) & (lane_b < (m + 1) * n_phases)
            masked = jnp.where(in_mode, sums, jnp.inf)
            idx = jnp.argmin(masked, axis=1, keepdims=True).astype(jnp.int32)
            cols_out.append(idx - m * n_phases)
        out_ref[0, :, :] = jnp.concatenate(cols_out, axis=1)


@partial(jax.jit, static_argnames=("n_half", "n_phases", "n_pack", "block",
                                   "qam_grid", "interpret"))
def _bps_pallas_nd(sig_re, sig_im, const_re, const_im, n_half, n_phases,
                   n_pack, qam_grid, block=512, interpret=False):
    """Phase indices for ``n_pack`` lane-packed modes. sig_*: (N, n_pack) f32."""
    n = sig_re.shape[0]
    n_blocks = int(np.ceil(n / block))
    n_pad = n_blocks * block
    halo = int(n_half)
    t_ext = block + 2 * halo

    # pre-gather overlapping halo windows: (n_blocks, block + 2*halo, n_pack)
    idx = np.arange(n_blocks)[:, None] * block + np.arange(t_ext)[None, :]
    idx_j = jnp.asarray(idx)

    def windows(x):
        xp = jnp.pad(x, ((halo, halo + (n_pad - n)), (0, 0)))
        return xp[idx_j]

    w_re = windows(sig_re)
    w_im = windows(sig_im)

    phases = (jnp.arange(n_phases) * (jnp.pi / 2) / n_phases).astype(jnp.float32)
    rot_re = jnp.tile(jnp.cos(phases), n_pack)[None, :]
    rot_im = jnp.tile(jnp.sin(phases), n_pack)[None, :]
    m_const = int(const_re.shape[0])
    lanes = n_pack * n_phases

    kernel = partial(_bps_kernel, block=block, halo=halo, m_const=m_const,
                     n_phases=int(n_phases), n_pack=int(n_pack),
                     qam_grid=qam_grid)
    idx_out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, t_ext, n_pack), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_ext, n_pack), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, n_pack), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, block, n_pack), jnp.int32),
        interpret=interpret,
    )(w_re, w_im, rot_re, rot_im, const_re[None, :], const_im[None, :])
    return idx_out.reshape(n_pad, n_pack)[:n]


def bps_pallas(sig, n_half, const_symb, n_phases, block=512, interpret=False):
    """Pallas-fused BPS phase estimation (drop-in for carrier_recovery.bps).

    Parameters match :func:`opticommpy_tpu.dsp.carrier_recovery.bps`; returns
    the estimated phases in [0, pi/2) per symbol (and mode).
    """
    sig_re, sig_im = split_ri(sig)  # no complex host->device transfer
    squeeze = sig_re.ndim == 1
    if squeeze:
        sig_re, sig_im = sig_re[:, None], sig_im[:, None]
    c_re, c_im = split_ri(const_symb)
    # The O(1) quantized-distance path needs concrete constellation values at
    # trace time; device arrays / tracers take the unrolled M-point min.
    qam_grid = None
    if isinstance(const_symb, np.ndarray):
        qam_grid = _square_qam_levels(const_symb.real, const_symb.imag)
    phases = (jnp.arange(n_phases) * (jnp.pi / 2) / n_phases).astype(jnp.float32)

    n_modes = sig_re.shape[1]
    # pack as many modes as fit in the 128 lanes per kernel call
    n_pack = max(1, min(n_modes, 128 // int(n_phases)))

    outs = []
    for k0 in range(0, n_modes, n_pack):
        g = min(n_pack, n_modes - k0)
        idx = _bps_pallas_nd(
            sig_re[:, k0:k0 + g], sig_im[:, k0:k0 + g], c_re, c_im,
            int(n_half), int(n_phases), int(g), qam_grid,
            block=block, interpret=interpret,
        )
        outs.append(phases[idx])
    est = jnp.concatenate(outs, axis=1)
    return est[:, 0] if squeeze else est
