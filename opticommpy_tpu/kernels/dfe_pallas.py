"""Pallas TPU kernel for the decision-feedback equalizer recurrence.

The DFE (reference equalization.py:1176, Numba cores :1301/:1423) is the
IM-DD side's per-symbol recurrence: the symbol decided at k enters the
feedback buffer that equalizes k+1, so it cannot be vectorized over time.
Like the MIMO/DD-PLL kernels, the whole loop runs inside one Pallas program
with the tap vectors and decision buffer in VMEM scratch — and a BATCH of
independent signals rides the sublane axis of the same instruction stream
(each column is its own DFE).

Decisions use the O(1) uniform-level quantizer when the constellation is a
uniform grid (PAM always is; square QAM factorizes per axis), else a masked
argmin.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from opticommpy_tpu.kernels._util import split_ri
from opticommpy_tpu.kernels.bps_pallas import _square_qam_levels

__all__ = ["dfe_pallas", "ffe_pallas"]


def _uniform_levels(c_re, c_im, tol=1e-5):
    """(lo, step, L) for a real uniform-level constellation (PAM), else None."""
    if np.any(np.abs(np.asarray(c_im)) > tol):
        return None
    re = np.sort(np.asarray(c_re, dtype=np.float64))
    if len(re) < 2:
        return None
    steps = np.diff(re)
    if not np.allclose(steps, steps[0], atol=tol):
        return None
    return float(re[0]), float(steps[0]), int(len(re))


def _kernel(win_re_ref, win_im_ref, ref_re_ref, ref_im_ref, cr_ref, ci_ref,
            f0_re_ref, f0_im_ref, b0_re_ref, b0_im_ref,
            y_re_ref, y_im_ref, mse_ref,
            fout_re_ref, fout_im_ref, bout_re_ref, bout_im_ref,
            f_re, f_im, b_re, b_im, d_re, d_im, *,
            block, n_batch, n_ff, n_fb, mu, n_train, m_const, fulltime,
            qam_grid, pam_grid, use_fb=True):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        f_re[...] = f0_re_ref[...]
        f_im[...] = f0_im_ref[...]
        b_re[...] = b0_re_ref[...]
        b_im[...] = b0_im_ref[...]
        d_re[...] = jnp.zeros_like(d_re)
        d_im[...] = jnp.zeros_like(d_im)

    def body(i, _):
        w_re = win_re_ref[i]  # (B, n_ff)
        w_im = win_im_ref[i]
        fr, fi = f_re[...], f_im[...]  # (B, n_ff)
        br, bi = b_re[...], b_im[...]  # (B, n_fb)
        dr, di = d_re[...], d_im[...]  # (B, n_fb)
        y_r = jnp.sum(fr * w_re - fi * w_im, axis=-1)  # (B,)
        y_i = jnp.sum(fr * w_im + fi * w_re, axis=-1)
        if use_fb:
            y_r = y_r + jnp.sum(br * dr - bi * di, axis=-1)
            y_i = y_i + jnp.sum(br * di + bi * dr, axis=-1)

        grid = qam_grid or pam_grid
        if grid is not None:
            lo, step, n_lev = grid

            def q(x):
                k = jnp.clip(jnp.round((x - lo) / step), 0.0, n_lev - 1.0)
                return k * step + lo

            dec_re = q(y_r)
            dec_im = q(y_i) if qam_grid is not None else jnp.zeros_like(y_i)
        else:
            d2 = (y_r[:, None] - cr_ref[0, :][None, :]) ** 2 + (
                y_i[:, None] - ci_ref[0, :][None, :]) ** 2
            ind = jnp.argmin(d2, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n_batch, m_const), 1)
            sel = (cols == ind[:, None]).astype(jnp.float32)
            dec_re = jnp.sum(sel * cr_ref[0, :][None, :], axis=1)
            dec_im = jnp.sum(sel * ci_ref[0, :][None, :], axis=1)

        k_global = blk * block + i
        use_ref = (k_global < n_train).astype(jnp.float32)
        t_re = use_ref * ref_re_ref[i] + (1.0 - use_ref) * dec_re
        t_im = use_ref * ref_im_ref[i] + (1.0 - use_ref) * dec_im
        e_re = t_re - y_r
        e_im = t_im - y_i
        gate = 1.0 if fulltime else use_ref
        # LMS: f += mu*e*conj(w), b += mu*e*conj(dbuf)
        f_re[...] = fr + (mu * gate) * (
            e_re[:, None] * w_re + e_im[:, None] * w_im)
        f_im[...] = fi + (mu * gate) * (
            e_im[:, None] * w_re - e_re[:, None] * w_im)
        if use_fb:
            b_re[...] = br + (mu * gate) * (
                e_re[:, None] * dr + e_im[:, None] * di)
            b_im[...] = bi + (mu * gate) * (
                e_im[:, None] * dr - e_re[:, None] * di)
            # decision buffer: newest at index 0 (reference roll(dbuf, 1))
            d_re[...] = jnp.concatenate([t_re[:, None], dr[:, :-1]], axis=1)
            d_im[...] = jnp.concatenate([t_im[:, None], di[:, :-1]], axis=1)

        y_re_ref[i] = y_r
        y_im_ref[i] = y_i
        mse_ref[i] = e_re**2 + e_im**2
        return 0

    jax.lax.fori_loop(0, block, body, 0)

    @pl.when(blk == pl.num_programs(0) - 1)
    def _():
        fout_re_ref[...] = f_re[...]
        fout_im_ref[...] = f_im[...]
        bout_re_ref[...] = b_re[...]
        bout_im_ref[...] = b_im[...]


@partial(jax.jit,
         static_argnames=("n_ff", "n_fb", "sps", "mu", "n_train", "block",
                          "fulltime", "qam_grid", "pam_grid", "use_fb",
                          "interpret"))
def _dfe_run(sig_re, sig_im, ref_re, ref_im, const_re, const_im,
             f0_re, f0_im, b0_re, b0_im, n_ff, n_fb, sps, mu, n_train,
             block=1024, fulltime=False, qam_grid=None, pam_grid=None,
             use_fb=True, interpret=False):
    """sig_*: (B, N) f32 planes at sps samples/symbol; ref_*: (B, nSym)."""
    from jax.experimental.pallas import tpu as pltpu

    n_batch = sig_re.shape[0]
    n_sym = ref_re.shape[1]
    n_blocks = int(np.ceil(n_sym / block))
    n_pad_sym = n_blocks * block

    def windows(x):  # (B, N) -> (n_pad_sym, B, n_ff)
        from opticommpy_tpu.kernels._util import sliding_windows

        xp = jnp.pad(x, ((0, 0), (0, n_ff + n_pad_sym * sps - x.shape[1])))
        return sliding_windows(xp, n_pad_sym, sps, n_ff,
                               axis=1).transpose(1, 0, 2)

    w_re = windows(sig_re)
    w_im = windows(sig_im)
    rp_re = jnp.pad(ref_re, ((0, 0), (0, n_pad_sym - n_sym))).T
    rp_im = jnp.pad(ref_im, ((0, 0), (0, n_pad_sym - n_sym))).T
    m_const = int(const_re.shape[0])

    kernel = partial(_kernel, block=block, n_batch=n_batch, n_ff=n_ff,
                     n_fb=n_fb, mu=mu, n_train=n_train, m_const=m_const,
                     fulltime=fulltime, qam_grid=qam_grid, pam_grid=pam_grid,
                     use_fb=use_fb)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, n_batch, n_ff), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_batch, n_ff), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_batch), lambda i: (i, 0)),
            pl.BlockSpec((block, n_batch), lambda i: (i, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_ff), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_ff), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_fb), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_fb), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, n_batch), lambda i: (i, 0)),
            pl.BlockSpec((block, n_batch), lambda i: (i, 0)),
            pl.BlockSpec((block, n_batch), lambda i: (i, 0)),
            pl.BlockSpec((n_batch, n_ff), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_ff), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_fb), lambda i: (0, 0)),
            pl.BlockSpec((n_batch, n_fb), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_sym, n_batch), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_sym, n_batch), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_sym, n_batch), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, n_ff), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, n_ff), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, n_fb), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, n_fb), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_batch, n_ff), jnp.float32),
            pltpu.VMEM((n_batch, n_ff), jnp.float32),
            pltpu.VMEM((n_batch, n_fb), jnp.float32),
            pltpu.VMEM((n_batch, n_fb), jnp.float32),
            pltpu.VMEM((n_batch, n_fb), jnp.float32),
            pltpu.VMEM((n_batch, n_fb), jnp.float32),
        ],
        interpret=interpret,
    )(w_re, w_im, rp_re, rp_im, const_re[None, :], const_im[None, :],
      f0_re, f0_im, b0_re, b0_im)
    y_re, y_im, mse, f_re, f_im, b_re, b_im = outs
    return (y_re[:n_sym].T, y_im[:n_sym].T, mse[:n_sym].T,
            f_re, f_im, b_re, b_im)


def dfe_pallas(sig, symb_ref, config=None, interpret=False, block=None):
    """Pallas decision-feedback equalizer (drop-in for dsp.dfe).

    Accepts one signal ((N,) samples, (nSym,) reference) or a BATCH
    ((B, N), (B, nSym)) — each batch row runs its own independent DFE on
    the sublane axis of one kernel pass. Returns (sigOut, f, b, mse) with
    shapes matching the input batching.
    """
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import DFEConfig
    from opticommpy_tpu.ops.signal import pnorm

    cfg = config if config is not None else DFEConfig()
    sig = jnp.asarray(sig)
    if block is None:
        # batched runs stream (block, B, n_ff) lane-padded window blocks
        # through VMEM — keep them inside the 16 MB scoped budget
        block = 1024 if (sig.ndim == 1 or sig.shape[0] == 1) else 256
    squeeze = sig.ndim == 1
    if squeeze:
        sig = sig[None]
        symb_ref = jnp.asarray(symb_ref)[None]
    # each row normalized independently, exactly ONCE: a global pnorm
    # before the per-row pass changes the f32 rounding and breaks the
    # batch-vs-single equality pin (round-5 catch; residual ulp-level
    # shape-dependent XLA reassociation can remain at some tap configs)
    sig = jax.vmap(pnorm)(sig).astype(jnp.complex64)
    symb_ref = jax.vmap(pnorm)(jnp.asarray(symb_ref)).astype(jnp.complex64)

    n_ff = cfg.nTapsFF
    n_fb = cfg.nTapsFB
    const_raw = np.asarray(gray_mapping(cfg.M, cfg.constType))
    const = (const_raw / np.sqrt(np.mean(np.abs(const_raw) ** 2))
             ).astype(np.complex64)  # host-side (safe under an outer jit)
    sig_pad = jnp.pad(sig, ((0, 0), (n_ff // 2, n_ff // 2)))
    n_out = int((sig_pad.shape[1] - n_ff + n_ff % 2) // cfg.SpS)
    b_sz = sig.shape[0]
    ref = jnp.zeros((b_sz, n_out), dtype=jnp.complex64)
    ref = ref.at[:, : symb_ref.shape[1]].set(symb_ref[:, :n_out])

    sig_re, sig_im = split_ri(sig_pad)
    ref_re, ref_im = split_ri(ref)
    f0 = np.zeros((b_sz, n_ff), np.complex64)
    f0[:, n_ff // 2] = 1.0
    b0 = np.zeros((b_sz, n_fb), np.complex64)

    qam_grid = _square_qam_levels(const.real, const.imag)
    pam_grid = None if qam_grid is not None else _uniform_levels(
        const.real, const.imag)

    f_re, f_im = jnp.asarray(f0.real), jnp.asarray(f0.imag)
    b_re, b_im = jnp.asarray(b0.real), jnp.asarray(b0.imag)
    for _ in range(cfg.preconvIters):
        y_re, y_im, mse, f_re, f_im, b_re, b_im = _dfe_run(
            sig_re, sig_im, ref_re, ref_im,
            jnp.asarray(const.real), jnp.asarray(const.imag),
            f_re, f_im, b_re, b_im,
            int(n_ff), int(n_fb), int(cfg.SpS), float(cfg.mu),
            int(cfg.nTrain), int(block),
            cfg.trainingMode == "fulltime", qam_grid, pam_grid,
            True, bool(interpret),
        )
    y = y_re + 1j * y_im
    f = f_re + 1j * f_im
    b = b_re + 1j * b_im
    if squeeze:
        return y[0], f[0], b[0], mse[0]
    return y, f, b, mse


def ffe_pallas(sig, symb_ref, config=None, interpret=False, block=None):
    """Pallas feedforward equalizer (drop-in for dsp.ffe).

    The DFE kernel with the feedback path compiled out. Single signal or a
    batch on the sublane axis; returns (sigOut, f, mse) like
    :func:`opticommpy_tpu.dsp.ffe` (the gradient always uses ``conj(win)``
    — identical to the scan for real-valued IM-DD signals).
    """
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import FFEConfig
    from opticommpy_tpu.ops.signal import pnorm

    cfg = config if config is not None else FFEConfig()
    sig = jnp.asarray(sig)
    squeeze = sig.ndim == 1
    if squeeze:
        sig = sig[None]
        symb_ref = jnp.asarray(symb_ref)[None]
    if block is None:
        block = 1024 if sig.shape[0] == 1 else 256
    # per-row pnorm exactly once (see dfe_pallas: a global pre-pnorm
    # breaks batch-vs-single bit exactness at f32 rounding)
    sig = jax.vmap(pnorm)(sig).astype(jnp.complex64)
    symb_ref = jax.vmap(pnorm)(jnp.asarray(symb_ref)).astype(jnp.complex64)

    n_ff = cfg.nTaps
    const_raw = np.asarray(gray_mapping(cfg.M, cfg.constType))
    const = (const_raw / np.sqrt(np.mean(np.abs(const_raw) ** 2))
             ).astype(np.complex64)
    sig_pad = jnp.pad(sig, ((0, 0), (n_ff // 2, n_ff // 2)))
    n_out = int((sig_pad.shape[1] - n_ff + n_ff % 2) // cfg.SpS)
    b_sz = sig.shape[0]
    ref = jnp.zeros((b_sz, n_out), dtype=jnp.complex64)
    ref = ref.at[:, : symb_ref.shape[1]].set(symb_ref[:, :n_out])

    sig_re, sig_im = split_ri(sig_pad)
    ref_re, ref_im = split_ri(ref)
    f0 = np.zeros((b_sz, n_ff), np.complex64)
    f0[:, n_ff // 2] = 1.0
    b0 = np.zeros((b_sz, 1), np.complex64)  # unused (use_fb=False)

    qam_grid = _square_qam_levels(const.real, const.imag)
    pam_grid = None if qam_grid is not None else _uniform_levels(
        const.real, const.imag)

    f_re, f_im = jnp.asarray(f0.real), jnp.asarray(f0.imag)
    b_re, b_im = jnp.asarray(b0.real), jnp.asarray(b0.imag)
    for _ in range(cfg.preconvIters):
        y_re, y_im, mse, f_re, f_im, b_re, b_im = _dfe_run(
            sig_re, sig_im, ref_re, ref_im,
            jnp.asarray(const.real), jnp.asarray(const.imag),
            f_re, f_im, b_re, b_im,
            int(n_ff), 1, int(cfg.SpS), float(cfg.mu),
            int(cfg.nTrain), int(block),
            cfg.trainingMode == "fulltime", qam_grid, pam_grid,
            False, bool(interpret),
        )
    y = y_re + 1j * y_im
    f = f_re + 1j * f_im
    if cfg.constType == "pam":
        y = y.real
    if squeeze:
        return y[0], f[0], mse[0]
    return y, f, mse
