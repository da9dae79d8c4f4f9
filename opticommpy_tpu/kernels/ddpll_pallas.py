"""Pallas TPU kernel for the decision-directed PLL carrier recovery.

Like the MIMO equalizer, the DD-PLL (reference carrierRecovery.py:226) is a
strict per-symbol recurrence: the phase estimate produced at symbol k rotates
symbol k+1 before its decision. The XLA ``lax.scan`` form pays loop overhead
per tiny iteration; this kernel runs the whole loop on-chip with the loop
state (phase, loop-filter accumulators for both polarizations) in VMEM
scratch, streaming symbol blocks through the grid pipeline.

Note: the (block, 2) block layout pads the 2-wide mode axis to the 128-lane
tile, so keep ``block`` modest (<=512) to stay inside scoped VMEM; a
transposed (2, block) layout would be denser and is a follow-up.

Supports pilot symbols via a per-symbol mask (1.0 -> use the provided
reference symbol in the phase detector, 0.0 -> hard decision).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from opticommpy_tpu.kernels._util import split_ri
from opticommpy_tpu.kernels.bps_pallas import _square_qam_levels

__all__ = ["ddpll_pallas"]


def _kernel(x_re_ref, x_im_ref, ref_re_ref, ref_im_ref, pilot_ref,
            cr_ref, ci_ref, coef_ref, out_ref, state, *, block, m_const,
            n_cols, qam_grid=None):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    def body(i, _):
        # state rows: 0 = phi, 1 = u_f, 2 = u_d (previous)
        phi = state[0, :]
        u_f = state[1, :]
        u_d1 = state[2, :]

        x_re = x_re_ref[i, :]  # (n_cols,) — each column an independent PLL
        x_im = x_im_ref[i, :]
        c = jnp.cos(phi)
        s = jnp.sin(phi)
        eo_re = x_re * c - x_im * s
        eo_im = x_re * s + x_im * c

        # slicer: pilot reference or nearest constellation point
        if qam_grid is not None:
            lo, step, n_lev = qam_grid  # O(1) square-QAM quantize

            def q(x):
                k = jnp.clip(jnp.round((x - lo) / step), 0.0, n_lev - 1.0)
                return k * step + lo

            dec_re = q(eo_re)
            dec_im = q(eo_im)
        else:
            d2 = (eo_re[:, None] - cr_ref[0, :][None, :]) ** 2 + (
                eo_im[:, None] - ci_ref[0, :][None, :]
            ) ** 2
            ind = jnp.argmin(d2, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n_cols, m_const), 1)
            sel = (cols == ind[:, None]).astype(jnp.float32)
            dec_re = jnp.sum(sel * cr_ref[0, :][None, :], axis=1)
            dec_im = jnp.sum(sel * ci_ref[0, :][None, :], axis=1)
        pil = pilot_ref[i, :]
        t_re = pil * ref_re_ref[i, :] + (1 - pil) * dec_re
        t_im = pil * ref_im_ref[i, :] + (1 - pil) * dec_im

        # phase detector: Im(eo * conj(target))
        u_d = eo_im * t_re - eo_re * t_im
        # 2nd-order loop filter: u_f' = a0*u_f + a1*u_d1 + a2*u_d
        a = coef_ref[0, :]  # (4,): a0, a1, a2, Kv
        u_f_new = a[0] * u_f + a[1] * u_d1 + a[2] * u_d
        out_ref[i, :] = phi
        state[0, :] = phi - a[3] * u_f_new
        state[1, :] = u_f_new
        state[2, :] = u_d
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@partial(jax.jit, static_argnames=("block", "qam_grid", "interpret"))
def _ddpll_run(x_re, x_im, ref_re, ref_im, pilot, const_re, const_im, coefs,
               block=512, qam_grid=None, interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    n = x_re.shape[0]
    n_blocks = int(np.ceil(n / block))
    n_pad = n_blocks * block

    def padrows(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0)))

    m_const = int(const_re.shape[0])
    n_cols = int(x_re.shape[1])
    kernel = partial(_kernel, block=block, m_const=m_const, n_cols=n_cols,
                     qam_grid=qam_grid)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
            pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
            pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
            pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
            pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, 4), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, n_cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, n_cols), jnp.float32)],
        interpret=interpret,
    )(padrows(x_re), padrows(x_im), padrows(ref_re), padrows(ref_im),
      padrows(pilot), const_re[None, :], const_im[None, :], coefs[None, :])
    return out[:n]


def ddpll_pallas(sig, ts, kv, tau1, tau2, const_symb, symb_tx=None,
                 pilot_ind=None, block=512, interpret=False):
    """Pallas DD-PLL (drop-in for carrier_recovery.ddpll).

    Returns the per-symbol phase estimates, matching the scan formulation.
    Each input column runs an independent PLL, so a BATCH of signals can be
    packed on the mode axis (``sig.reshape(N, B*modes)`` column-wise) and
    recovered in one kernel pass — the same lane-packing recipe as the
    batched BPS/MIMO kernels.
    """
    sig_re, sig_im = split_ri(sig)  # no complex host->device transfer
    squeeze = sig_re.ndim == 1
    if squeeze:
        sig_re, sig_im = sig_re[:, None], sig_im[:, None]
    n_modes_in = sig_re.shape[1]
    if n_modes_in == 1:
        # a 1-wide lane axis lowers poorly; pad to 2 and drop the extra
        sig_re = jnp.concatenate([sig_re, jnp.zeros_like(sig_re)], axis=1)
        sig_im = jnp.concatenate([sig_im, jnp.zeros_like(sig_im)], axis=1)
    n = sig_re.shape[0]
    n_cols = sig_re.shape[1]
    const_symb = np.asarray(const_symb).astype(np.complex64)

    if symb_tx is None:
        ref_re = ref_im = jnp.zeros((n, n_cols), dtype=jnp.float32)
    else:
        ref_re, ref_im = split_ri(symb_tx)
        if ref_re.ndim == 1:
            ref_re, ref_im = ref_re[:, None], ref_im[:, None]
        if ref_re.shape[1] < n_cols:
            padc = n_cols - ref_re.shape[1]
            ref_re = jnp.pad(ref_re, ((0, 0), (0, padc)))
            ref_im = jnp.pad(ref_im, ((0, 0), (0, padc)))
    pilot = np.zeros((n, n_cols), dtype=np.float32)
    if pilot_ind is not None:
        pilot[np.asarray(pilot_ind)] = 1.0

    a = np.array(
        [
            1.0,
            ts / (2 * tau1) * (1 - 1 / np.tan(ts / (2 * tau2))),
            ts / (2 * tau1) * (1 + 1 / np.tan(ts / (2 * tau2))),
            kv,
        ],
        dtype=np.float32,
    )
    qam_grid = _square_qam_levels(const_symb.real, const_symb.imag)
    est = _ddpll_run(
        sig_re, sig_im, ref_re, ref_im,
        jnp.asarray(pilot), jnp.asarray(const_symb.real),
        jnp.asarray(const_symb.imag), jnp.asarray(a), block, qam_grid,
        interpret,
    )
    est = est[:, :n_modes_in]
    return est[:, 0] if squeeze else est
