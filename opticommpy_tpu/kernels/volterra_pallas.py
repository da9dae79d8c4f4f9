"""Pallas TPU kernel for the decision-directed Volterra equalizer.

The 3rd-order Volterra LMS recurrence (dsp/equalization.py `volterra`,
reference equalization.py:1868,1986) was the last equalizer family with
neither a fast path nor a TPU number (VERDICT r2 item 8); the XLA scan
measures 0.12 Msym/s on v5e — per-symbol dispatch overhead, since the
actual work is ~190 real MACs/symbol. This kernel runs the recurrence
with all three kernels' taps resident in VMEM, B independent signals
sharing the sublane axis (the batch-packing recipe of the DFE/MIMO/RLS
kernels).

Mosaic-friendly forms (hard-won; see CLAUDE.md): no rank-2 -> rank-1
intermediates, no lane-axis reshapes — the quadratic/cubic feature
contractions unroll over the (small, static) outer tap indices with
lane-sliced chunks of FLAT kernel tensors:

    y2 = sum_j x2[:, j] * <h2[:, j*n2:(j+1)*n2], x2>
    y3 = sum_{i,j} x3[:, i] x3[:, j] * <h3[:, (i*n3+j)*n3:+n3], x3>

The PAM decision uses the O(1) quantized slicer (uniform grid ==
argmin-nearest, and in-kernel argmin is an XLA:TPU crash risk anyway).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["volterra_pallas"]


def _kernel(win_ref, ref_ref, h1_0, h2_0, h3_0,
            out_ref, mse_ref, h1_out, h2_out, h3_out,
            h1, h2, h3, *, block, n1, n2, n3, t2, t3, mu, n_train,
            fulltime, n_sym, order, grid):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        h1[...] = h1_0[...]
        h2[...] = h2_0[...]
        h3[...] = h3_0[...]

    lo, step, n_lev = grid

    def body(i, _):
        win = win_ref[i]  # (B, n1)
        x2 = win[:, t2:t2 + n2]
        y = jnp.sum(h1[...] * win, axis=1, keepdims=True)  # (B, 1)
        for j in range(n2):
            inner = jnp.sum(h2[:, j * n2:(j + 1) * n2] * x2, axis=1,
                            keepdims=True)
            y = y + x2[:, j:j + 1] * inner
        if order == 3:
            x3 = win[:, t3:t3 + n3]
            for ij in range(n3 * n3):
                ii, jj = ij // n3, ij % n3
                inner = jnp.sum(h3[:, ij * n3:(ij + 1) * n3] * x3, axis=1,
                                keepdims=True)
                y = y + x3[:, ii:ii + 1] * x3[:, jj:jj + 1] * inner
        # O(1) PAM slicer (uniform normalized grid == nearest level)
        kq = jnp.clip(jnp.round((y - lo) / step), 0.0, n_lev - 1.0)
        dec = kq * step + lo
        k_sym = b * block + i
        ref = ref_ref[i]  # (B, 1)
        tgt = jnp.where(k_sym < n_train, ref, dec)
        e = tgt - y  # (B, 1)
        upd = jnp.float32(1.0) if fulltime else (
            (k_sym < n_train).astype(jnp.float32))
        live = (k_sym < n_sym).astype(jnp.float32)
        g = e * (mu * upd * live)  # (B, 1)
        h1[...] = h1[...] + g * win
        for j in range(n2):
            h2[:, j * n2:(j + 1) * n2] = (
                h2[:, j * n2:(j + 1) * n2] + (0.5 * g) * x2[:, j:j + 1] * x2)
        if order == 3:
            for ij in range(n3 * n3):
                ii, jj = ij // n3, ij % n3
                h3[:, ij * n3:(ij + 1) * n3] = (
                    h3[:, ij * n3:(ij + 1) * n3]
                    + (g / 7.0) * x3[:, ii:ii + 1] * x3[:, jj:jj + 1] * x3)
        out_ref[i] = y
        mse_ref[i] = e * e
        return 0

    jax.lax.fori_loop(0, block, body, 0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        h1_out[...] = h1[...]
        h2_out[...] = h2[...]
        h3_out[...] = h3[...]


@partial(jax.jit, static_argnames=("grid", "cfg", "n_sym", "block", "interpret"))
def _volterra_run(wins, refs, h1_0, h2_0, h3_0, grid, cfg, n_sym,
                  block=512, interpret=False):
    """wins: (n_pad_sym, B, n1) f32; refs: (n_pad_sym, B, 1) f32;
    h*_0: (B, n1) / (B, n2*n2) / (B, n3**3 // n3? no: n3*n3*n3) flat."""
    n_pad_sym, B, n1 = wins.shape
    n2, n3 = cfg.n2Taps, cfg.n3Taps
    n_blocks = n_pad_sym // block
    shapes = [(B, n1), (B, n2 * n2), (B, n3 * n3 * n3)]
    full = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))
    kernel = partial(
        _kernel, block=block, n1=n1, n2=n2, n3=n3,
        t2=(cfg.n1Taps - n2) // 2, t3=(cfg.n1Taps - n3) // 2,
        mu=float(cfg.mu), n_train=int(cfg.nTrain),
        fulltime=cfg.trainingMode == "fulltime",
        n_sym=int(n_sym), order=int(cfg.order), grid=grid)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, B, n1), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, B, 1), lambda i: (i, 0, 0)),
            full(shapes[0]), full(shapes[1]), full(shapes[2]),
        ],
        out_specs=[
            pl.BlockSpec((block, B, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, B, 1), lambda i: (i, 0, 0)),
            full(shapes[0]), full(shapes[1]), full(shapes[2]),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_sym, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_sym, B, 1), jnp.float32),
            jax.ShapeDtypeStruct(shapes[0], jnp.float32),
            jax.ShapeDtypeStruct(shapes[1], jnp.float32),
            jax.ShapeDtypeStruct(shapes[2], jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in shapes],
        interpret=interpret,
    )(wins, refs, h1_0, h2_0, h3_0)
    return outs


def volterra_pallas(sig, symb_ref, config, block=512, interpret=False):
    """Pallas Volterra equalizer; same contract as
    :func:`opticommpy_tpu.dsp.equalization.volterra` plus a leading batch
    axis option.

    ``sig``: (N,) or (B, N) real samples at config.SpS; ``symb_ref``:
    (nSym,) / (B, nSym). Returns (y, [h1, h2, h3], mse) with the batch
    axis mirrored on every output; h2/h3 come back in their square/cubic
    shapes. Decision = O(1) uniform-PAM slicer (== nearest-symbol argmin).
    """
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.ops.signal import anorm, pnorm

    cfg = config
    sig = jnp.asarray(sig)
    batched = sig.ndim == 2
    if not batched:
        sig = sig[None]
    symb_ref = jnp.asarray(symb_ref)
    if symb_ref.ndim == 1:
        symb_ref = symb_ref[None]
    B = sig.shape[0]
    sig = jax.vmap(lambda s: anorm(pnorm(s)).real.astype(jnp.float32))(sig)
    symb_ref = jax.vmap(
        lambda r: pnorm(r).real.astype(jnp.float32))(symb_ref)

    # host-side numpy (never jnp: this wrapper may run under an outer jit
    # trace, where jnp constants become tracers — CLAUDE.md); same math
    # as dsp.equalization._norm_const
    c0 = np.asarray(gray_mapping(cfg.M, cfg.constType))
    const = np.real(c0 / np.sqrt(np.mean(np.abs(c0) ** 2))).astype(
        np.float32)
    levels = np.sort(np.unique(const))
    step = float(levels[1] - levels[0]) if levels.size > 1 else 1.0
    grid = (float(levels[0]), step, float(levels.size))

    n_taps = max(cfg.n1Taps, cfg.n2Taps, cfg.n3Taps)
    sig_pad = jnp.pad(sig, ((0, 0), (n_taps // 2, n_taps // 2)))
    n_out = int((sig_pad.shape[1] - n_taps + n_taps % 2) // cfg.SpS)
    n_blocks = -(-n_out // block)
    n_pad_sym = n_blocks * block

    from opticommpy_tpu.kernels._util import sliding_windows

    need = (n_pad_sym - 1) * cfg.SpS + n_taps
    extra = max(0, need - sig_pad.shape[1])
    if extra:
        sig_pad = jnp.pad(sig_pad, ((0, 0), (0, extra)))
    wins = sliding_windows(sig_pad, n_pad_sym, cfg.SpS, n_taps,
                           axis=1)  # (B, n_pad_sym, n1)
    wins = wins.transpose(1, 0, 2)
    refs = jnp.zeros((B, n_pad_sym), jnp.float32).at[
        :, :symb_ref.shape[1]].set(symb_ref[:, :n_pad_sym])
    refs = refs.T[:, :, None]

    h1_0 = jnp.zeros((B, cfg.n1Taps), jnp.float32).at[
        :, cfg.n1Taps // 2].set(1.0)
    h2_0 = jnp.zeros((B, cfg.n2Taps * cfg.n2Taps), jnp.float32)
    h3_0 = jnp.zeros((B, cfg.n3Taps ** 3), jnp.float32)
    for _ in range(cfg.preconvIters):
        y, mse, h1_0, h2_0, h3_0 = _volterra_run(
            wins, refs, h1_0, h2_0, h3_0, grid, cfg, n_out, block=block,
            interpret=interpret)
    y = y[:n_out, :, 0].T
    y = jax.vmap(pnorm)(y)  # volterra() pnorm-normalizes its output
    mse = mse[:n_out, :, 0].T
    h1 = h1_0
    h2 = h2_0.reshape(B, cfg.n2Taps, cfg.n2Taps)
    h3 = h3_0.reshape(B, cfg.n3Taps, cfg.n3Taps, cfg.n3Taps)
    if not batched:
        return y[0], [h1[0], h2[0], h3[0]], mse[0]
    return y, [h1, h2, h3], mse
