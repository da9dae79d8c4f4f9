"""Pallas TPU kernels for the NxN MIMO adaptive equalizer recurrence.

The adaptive equalizer is the framework's hardest kernel (SURVEY.md §7): a
true per-symbol recurrence (the taps updated at symbol k feed symbol k+1), so
neither vmap nor the MXU can parallelize across time. The ``lax.scan``
formulation pays XLA loop overhead per 240-FLOP iteration (~3 us/symbol on
TPU). This kernel runs the whole recurrence inside one Pallas program:

- the tap tensor H lives in a VMEM scratch register block for the entire
  signal,
- input windows are pre-gathered to a (N, 2*taps) layout (real/imag planes)
  and streamed through VMEM by the grid pipeline in blocks,
- each ``fori_loop`` iteration does the filter dot product, the
  rule-specific error, and the rank-1 gradient update on (1, lanes) tiles.

Update rules (selected at trace time via the static ``alg`` argument, so each
variant compiles to its own straight-line kernel — mirroring the reference's
per-rule Numba kernels equalization.py:519-973):

- ``'lms'``   — data-aided for the first ``n_train`` symbols, decision-
  directed afterwards (the reference's da/dd-lms training schedule).
- ``'nlms'``  — same error, window normalized by its per-input-mode power.
- ``'cma'``   — blind constant-modulus: e = (R - |y|^2) y.
- ``'rde'``   — blind radius-directed: e = (R_dec^2 - |y|^2) y with R_dec the
  nearest constellation radius.

Interpret mode runs on CPU for tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from opticommpy_tpu.kernels._util import auto_block, split_ri
from opticommpy_tpu.kernels.bps_pallas import _square_qam_levels

__all__ = ["mimo_lms_pallas", "mimo_eq_pallas", "mimo_eq_pallas_batch"]


def _kernel(win_re_ref, win_im_ref, ref_re_ref, ref_im_ref, cr_ref, ci_ref,
            aux_ref, h0_re_ref, h0_im_ref, out_re_ref, out_im_ref,
            hout_re_ref, hout_im_ref, h_re, h_im, *, block, width, mu,
            n_train, m_const, alg, m_aux, n_modes=2, qam_grid=None):
    """Grid step over symbol blocks; H carried in VMEM scratch across steps."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        h_re[...] = h0_re_ref[...]
        h_im[...] = h0_im_ref[...]

    def body(i, _):
        w_re = win_re_ref[i, :]  # (width,) flattened taps x modes
        w_im = win_im_ref[i, :]
        # filter outputs for all output modes: o = sum(H[o] * w) (complex)
        hr = h_re[...]  # (n_modes, width)
        hi = h_im[...]
        o_re = jnp.sum(hr * w_re[None, :] - hi * w_im[None, :], axis=1)
        o_im = jnp.sum(hr * w_im[None, :] + hi * w_re[None, :], axis=1)

        if alg in ("lms", "nlms"):
            k_global = b * block + i
            # reference: data-aided before n_train, decision-directed after
            r_re = ref_re_ref[i, :]  # (n_modes,)
            r_im = ref_im_ref[i, :]
            if qam_grid is not None:
                # uniform square grid: the nearest point factorizes per
                # axis -> O(1) quantize (same trick as the Pallas BPS)
                lo, step, n_lev = qam_grid

                def q(x):
                    k = jnp.clip(jnp.round((x - lo) / step), 0.0,
                                 n_lev - 1.0)
                    return k * step + lo

                dec_re = q(o_re)
                dec_im = q(o_im)
            else:
                d2 = (o_re[:, None] - cr_ref[0, :][None, :]) ** 2 + (
                    o_im[:, None] - ci_ref[0, :][None, :]
                ) ** 2  # (n_modes, M)
                # nearest constellation point via min-mask reduction (Mosaic
                # supports only 2-D gathers; an argmin-indexed 1-D gather
                # fails to lower)
                ind = jnp.argmin(d2, axis=1)  # (n_modes,)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (n_modes, m_const), 1)
                sel = (cols == ind[:, None]).astype(jnp.float32)
                dec_re = jnp.sum(sel * cr_ref[0, :][None, :], axis=1)
                dec_im = jnp.sum(sel * ci_ref[0, :][None, :], axis=1)
            use_ref = k_global < n_train
            t_re = jnp.where(use_ref, r_re, dec_re)
            t_im = jnp.where(use_ref, r_im, dec_im)
            e_re = t_re - o_re
            e_im = t_im - o_im
        elif alg == "cma":
            # e = (R - |y|^2) * y ; R in aux_ref[0, 0]
            err = aux_ref[0, 0] - (o_re**2 + o_im**2)  # (n_modes,)
            e_re = err * o_re
            e_im = err * o_im
        elif alg == "rde":
            # nearest radius among aux_ref[0, :] (constellation radii)
            r = jnp.sqrt(o_re**2 + o_im**2)  # (n_modes,)
            d2 = (r[:, None] - aux_ref[0, :][None, :]) ** 2  # (n_modes, m_aux)
            ind = jnp.argmin(d2, axis=1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (n_modes, m_aux), 1)
            sel = (cols == ind[:, None]).astype(jnp.float32)
            r_dec = jnp.sum(sel * aux_ref[0, :][None, :], axis=1)
            err = r_dec**2 - (o_re**2 + o_im**2)
            e_re = err * o_re
            e_im = err * o_im
        elif alg == "da-rde":
            # data-aided radius: R from the reference symbol, not the
            # decision (reference dardeUp; phase-blind first stage)
            r_re = ref_re_ref[i, :]
            r_im = ref_im_ref[i, :]
            err = (r_re**2 + r_im**2) - (o_re**2 + o_im**2)
            e_re = err * o_re
            e_im = err * o_im
        else:
            raise ValueError(f"unknown alg {alg}")

        # rank-1 gradient update: H[o] += mu * e[o] * conj(w)
        if alg == "nlms":
            # normalize by the per-input-mode window power (reference
            # nlmsUp equalization.py:519): lane l belongs to input mode
            # l % n_modes (flattened taps x modes layout)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)[0, :]
            pw = w_re**2 + w_im**2
            p_mode = jnp.zeros_like(pw)
            for mm in range(n_modes):  # static unroll, n_modes small
                msk = (lane % n_modes == mm).astype(jnp.float32)
                p_mode = p_mode + msk * jnp.sum(pw * msk)
            # zero-padded tail windows have zero power — guard the division
            # (the numerator is zero there, so the update is a no-op)
            p_mode = jnp.maximum(p_mode, 1e-12)
            g_re = w_re / p_mode
            g_im = w_im / p_mode
        else:
            g_re = w_re
            g_im = w_im
        upd_re = e_re[:, None] * g_re[None, :] + e_im[:, None] * g_im[None, :]
        upd_im = e_im[:, None] * g_re[None, :] - e_re[:, None] * g_im[None, :]
        h_re[...] = hr + mu * upd_re
        h_im[...] = hi + mu * upd_im

        out_re_ref[i, :] = o_re
        out_im_ref[i, :] = o_im
        return 0

    jax.lax.fori_loop(0, block, body, 0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        hout_re_ref[...] = h_re[...]
        hout_im_ref[...] = h_im[...]


@partial(jax.jit,
         static_argnames=("n_taps", "sps", "mu", "n_train", "block", "alg",
                          "qam_grid", "interpret"))
def _mimo_eq_run(sig_re, sig_im, ref_re, ref_im, const_re, const_im, aux,
                 h0_re, h0_im, n_taps, sps, mu, n_train, block=1024,
                 alg="lms", qam_grid=None, interpret=False):
    """sig_*: (N, n_modes) f32 at sps samples/symbol; ref_*: (nSym, n_modes)."""
    n_sym = ref_re.shape[0]
    n_blocks = int(np.ceil(n_sym / block))
    n_pad_sym = n_blocks * block
    l_pad = n_taps // 2
    n_modes = sig_re.shape[1]
    width = n_modes * n_taps  # flattened (taps, modes)

    def windows(x):
        from opticommpy_tpu.kernels._util import sliding_windows

        xp = jnp.pad(x, ((l_pad, l_pad + sps + n_taps + n_pad_sym * sps
                          - x.shape[0]), (0, 0)))
        # build only the n_sym live rows — _mimo_eq_run_windows pads the
        # tail block itself (building n_pad_sym here would double-pad)
        w = sliding_windows(xp, n_sym, sps, n_taps)  # (n_sym, taps, modes)
        return w.reshape(n_sym, width)

    out_re, out_im, h_re, h_im = _mimo_eq_run_windows(
        windows(sig_re), windows(sig_im), ref_re, ref_im, const_re,
        const_im, aux, h0_re, h0_im, n_modes, mu, n_train, block, alg,
        qam_grid, interpret)
    return out_re, out_im, h_re, h_im


@partial(jax.jit,
         static_argnames=("n_modes", "mu", "n_train", "block", "alg",
                          "qam_grid", "interpret"))
def _mimo_eq_run_windows(w_re, w_im, ref_re, ref_im, const_re, const_im,
                         aux, h0_re, h0_im, n_modes, mu, n_train,
                         block=1024, alg="lms", qam_grid=None,
                         interpret=False):
    """Windows-level core: w_*: (nSym, width) pre-gathered symbol windows
    in the flattened (taps, modes) lane layout; ref_*: (nSym, n_modes).

    Exposed separately so the multi-stage training path
    (:func:`opticommpy_tpu.dsp.mimo_adapt_equalizer` with
    ``backend='pallas'``) can slice per-stage windows from ITS padded
    signal with exactly the scan stages' alignment and chain H between
    stage kernels."""
    from jax.experimental.pallas import tpu as pltpu

    n_sym = ref_re.shape[0]
    n_blocks = int(np.ceil(n_sym / block))
    n_pad_sym = n_blocks * block
    width = w_re.shape[1]
    # zero-pad the tail block: zero windows make every rule's update a
    # no-op (the gradient is e * conj(0); nlms divides by the guarded
    # power with a zero numerator), so the carried H is unaffected
    w_re = jnp.pad(w_re, ((0, n_pad_sym - n_sym), (0, 0)))
    w_im = jnp.pad(w_im, ((0, n_pad_sym - n_sym), (0, 0)))
    rp_re = jnp.pad(ref_re, ((0, n_pad_sym - n_sym), (0, 0)))
    rp_im = jnp.pad(ref_im, ((0, n_pad_sym - n_sym), (0, 0)))
    m_const = int(const_re.shape[0])
    m_aux = int(aux.shape[0])

    kernel = partial(_kernel, block=block, width=width, mu=mu,
                     n_train=n_train, m_const=m_const, alg=alg, m_aux=m_aux,
                     n_modes=n_modes, qam_grid=qam_grid)
    out_re, out_im, h_re, h_im = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, width), lambda i: (i, 0)),
            pl.BlockSpec((block, width), lambda i: (i, 0)),
            pl.BlockSpec((block, n_modes), lambda i: (i, 0)),
            pl.BlockSpec((block, n_modes), lambda i: (i, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_aux), lambda i: (0, 0)),
            pl.BlockSpec((n_modes, width), lambda i: (0, 0)),
            pl.BlockSpec((n_modes, width), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, n_modes), lambda i: (i, 0)),
            pl.BlockSpec((block, n_modes), lambda i: (i, 0)),
            pl.BlockSpec((n_modes, width), lambda i: (0, 0)),
            pl.BlockSpec((n_modes, width), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_sym, n_modes), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_sym, n_modes), jnp.float32),
            jax.ShapeDtypeStruct((n_modes, width), jnp.float32),
            jax.ShapeDtypeStruct((n_modes, width), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_modes, width), jnp.float32),
            pltpu.VMEM((n_modes, width), jnp.float32),
        ],
        interpret=interpret,
    )(w_re, w_im, rp_re, rp_im, const_re[None, :], const_im[None, :],
      aux[None, :], h0_re, h0_im)
    return out_re[:n_sym], out_im[:n_sym], h_re, h_im


def mimo_eq_pallas(sig, symb_ref, const, alg="lms", n_taps=15, sps=2, mu=2e-3,
                   n_train=10000, block=1024, H0=None, interpret=False):
    """Pallas NxN adaptive equalizer with selectable update rule.

    ``alg``: 'lms' (data-aided -> decision-directed), 'nlms' (normalized),
    'cma' (blind constant-modulus), 'rde' (blind radius-directed),
    'da-rde' (data-aided radius-directed — phase-blind training stage).
    Parameters mirror :func:`opticommpy_tpu.dsp.mimo_adapt_equalizer`.
    For the blind rules ``symb_ref`` may be None. The mode count is taken from
    ``sig.shape[1]`` (2 = polmux, 4+ = SDM; the reference equalizer is NxN,
    equalization.py:125). Returns (equalized symbols (nSym, n_modes)
    complex, tap tensor H (n_modes, n_modes, n_taps)).
    """
    sig_re, sig_im = split_ri(sig)  # no complex host->device transfer
    const = np.asarray(const).astype(np.complex64)
    n_modes = sig_re.shape[1]
    if symb_ref is None:
        if alg in ("lms", "nlms", "da-rde"):
            raise ValueError(
                "symb_ref is required for alg='lms'/'nlms'/'da-rde'")
        n_sym = sig_re.shape[0] // sps
        ref_re = ref_im = jnp.zeros((n_sym, n_modes), dtype=jnp.float32)
    else:
        ref_re, ref_im = split_ri(symb_ref)
    if H0 is None:
        h0 = np.zeros((n_modes, n_modes, n_taps), dtype=np.complex64)
        h0[np.arange(n_modes), np.arange(n_modes), n_taps // 2] = 1.0
    else:
        h0 = np.asarray(H0).astype(np.complex64)
    h0_flat = h0.transpose(0, 2, 1).reshape(n_modes, n_modes * n_taps)

    # rule-specific host constants (reference cmaUp:788 / rdeUp:846)
    if alg == "cma":
        r_cma = np.mean(np.abs(const) ** 4) / np.mean(np.abs(const) ** 2)
        aux = np.array([r_cma], dtype=np.float32)
    elif alg == "rde":
        aux = np.unique(np.round(np.abs(const), 6)).astype(np.float32)
    else:
        aux = np.zeros(1, dtype=np.float32)

    qam_grid = _square_qam_levels(const.real, const.imag)
    out_re, out_im, h_re, h_im = _mimo_eq_run(
        sig_re, sig_im, ref_re, ref_im,
        jnp.asarray(const.real), jnp.asarray(const.imag), jnp.asarray(aux),
        jnp.asarray(h0_flat.real), jnp.asarray(h0_flat.imag),
        int(n_taps), int(sps), float(mu), int(n_train), int(block), str(alg),
        qam_grid, bool(interpret),
    )
    y = out_re + 1j * out_im
    h = (h_re + 1j * h_im).reshape(n_modes, n_taps, n_modes).transpose(0, 2, 1)
    return y, h


def mimo_lms_pallas(sig, symb_ref, const, n_taps=15, sps=2, mu=2e-3,
                    n_train=10000, block=1024, H0=None, interpret=False):
    """Pallas 2x2 LMS equalizer: data-aided then decision-directed.

    Back-compat wrapper for :func:`mimo_eq_pallas` with ``alg='lms'``.
    """
    return mimo_eq_pallas(sig, symb_ref, const, "lms", n_taps, sps, mu,
                          n_train, block, H0, interpret)


# ---------------------------------------------------------------------------
# Batched variant: B independent signals adapt in ONE kernel pass
# ---------------------------------------------------------------------------


def _kernel_batch(win_re_ref, win_im_ref, ref_re_ref, ref_im_ref, cr_ref,
                  ci_ref, aux_ref, h0_re_ref, h0_im_ref, out_re_ref,
                  out_im_ref, hout_re_ref, hout_im_ref, h_re, h_im, *,
                  block, n_batch, width, mu, n_train, m_const, alg, m_aux,
                  n_modes=2, qam_grid=None):
    """Grid step over symbol blocks; per-signal H tensors in VMEM scratch.

    Identical math to :func:`_kernel` for every signal — the batch rides the
    sublane axis ((n_batch, width) planes per symbol), so the per-symbol
    instruction stream serves all B recurrences at once instead of leaving
    7/8 of each vector register idle (a vmapped per-signal kernel measured
    ~2.7x slower than this layout for the analogous BPS case on v5e).
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        h_re[...] = h0_re_ref[...]
        h_im[...] = h0_im_ref[...]

    def body(i, _):
        w_re = win_re_ref[i]  # (n_batch, width)
        w_im = win_im_ref[i]
        hr = h_re[...]  # (n_modes, n_batch, width)
        hi = h_im[...]
        o_re = jnp.sum(hr * w_re[None] - hi * w_im[None], axis=-1)
        o_im = jnp.sum(hr * w_im[None] + hi * w_re[None], axis=-1)

        if alg in ("lms", "nlms"):
            k_global = b * block + i
            r_re = ref_re_ref[i]  # (n_modes, B)
            r_im = ref_im_ref[i]
            if qam_grid is not None:
                lo, step, n_lev = qam_grid

                def q(x):
                    k = jnp.clip(jnp.round((x - lo) / step), 0.0,
                                 n_lev - 1.0)
                    return k * step + lo

                dec_re = q(o_re)
                dec_im = q(o_im)
            else:
                d2 = (o_re[..., None] - cr_ref[0, :][None, None, :]) ** 2 + (
                    o_im[..., None] - ci_ref[0, :][None, None, :]) ** 2
                ind = jnp.argmin(d2, axis=-1)  # (n_modes, B)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (n_modes, n_batch, m_const), 2)
                sel = (cols == ind[..., None]).astype(jnp.float32)
                dec_re = jnp.sum(sel * cr_ref[0, :][None, None, :], axis=-1)
                dec_im = jnp.sum(sel * ci_ref[0, :][None, None, :], axis=-1)
            use_ref = k_global < n_train
            t_re = jnp.where(use_ref, r_re, dec_re)
            t_im = jnp.where(use_ref, r_im, dec_im)
            e_re = t_re - o_re
            e_im = t_im - o_im
        elif alg == "cma":
            err = aux_ref[0, 0] - (o_re**2 + o_im**2)  # (n_modes, B)
            e_re = err * o_re
            e_im = err * o_im
        elif alg == "rde":
            r = jnp.sqrt(o_re**2 + o_im**2)  # (n_modes, B)
            d2 = (r[..., None] - aux_ref[0, :][None, None, :]) ** 2
            ind = jnp.argmin(d2, axis=-1)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (n_modes, n_batch, m_aux), 2)
            sel = (cols == ind[..., None]).astype(jnp.float32)
            r_dec = jnp.sum(sel * aux_ref[0, :][None, None, :], axis=-1)
            err = r_dec**2 - (o_re**2 + o_im**2)
            e_re = err * o_re
            e_im = err * o_im
        elif alg == "da-rde":
            r_re = ref_re_ref[i]  # (n_modes, B)
            r_im = ref_im_ref[i]
            err = (r_re**2 + r_im**2) - (o_re**2 + o_im**2)
            e_re = err * o_re
            e_im = err * o_im
        else:
            raise ValueError(f"unknown alg {alg}")

        if alg == "nlms":
            lane = jax.lax.broadcasted_iota(jnp.int32, (n_batch, width), 1)
            pw = w_re**2 + w_im**2
            p_mode = jnp.zeros_like(pw)
            for mm in range(n_modes):  # static unroll, n_modes small
                msk = (lane % n_modes == mm).astype(jnp.float32)
                p_mode = p_mode + msk * jnp.sum(pw * msk, axis=-1,
                                                keepdims=True)
            p_mode = jnp.maximum(p_mode, 1e-12)
            g_re = w_re / p_mode
            g_im = w_im / p_mode
        else:
            g_re = w_re
            g_im = w_im
        upd_re = e_re[..., None] * g_re[None] + e_im[..., None] * g_im[None]
        upd_im = e_im[..., None] * g_re[None] - e_re[..., None] * g_im[None]
        h_re[...] = hr + mu * upd_re
        h_im[...] = hi + mu * upd_im

        out_re_ref[i] = o_re
        out_im_ref[i] = o_im
        return 0

    jax.lax.fori_loop(0, block, body, 0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        hout_re_ref[...] = h_re[...]
        hout_im_ref[...] = h_im[...]


@partial(jax.jit,
         static_argnames=("n_modes", "mu", "n_train", "block", "alg",
                          "qam_grid", "interpret"))
def _mimo_eq_run_batch_windows(w_re, w_im, rp_re, rp_im, const_re, const_im,
                               aux, hf_re, hf_im, n_modes, mu, n_train,
                               block=256, alg="lms", qam_grid=None,
                               interpret=False):
    """Windows-level batched runner (multi-stage training entry point).

    w_*: (n_pad_sym, B, width) pre-gathered symbol windows (n_pad_sym a
    multiple of ``block``; width = n_modes*n_taps, tap-major/mode-minor
    lanes); rp_*: (n_pad_sym, n_modes, B) references; hf_*: (n_modes, B,
    width) fused taps. Returns the raw fused-layout outputs
    (out_re, out_im, h_re, h_im).
    """
    from jax.experimental.pallas import tpu as pltpu

    n_pad_sym, n_batch, width = w_re.shape
    n_blocks = n_pad_sym // block
    m_const = int(const_re.shape[-1])
    m_aux = int(aux.shape[-1])

    kernel = partial(_kernel_batch, block=block, n_batch=n_batch, width=width,
                     mu=mu, n_train=n_train, m_const=m_const, alg=alg,
                     m_aux=m_aux, n_modes=n_modes, qam_grid=qam_grid)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, n_batch, width), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_batch, width), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_modes, n_batch), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_modes, n_batch), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_const), lambda i: (0, 0)),
            pl.BlockSpec((1, m_aux), lambda i: (0, 0)),
            pl.BlockSpec((n_modes, n_batch, width), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_modes, n_batch, width), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, n_modes, n_batch), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, n_modes, n_batch), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_modes, n_batch, width), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_modes, n_batch, width), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_sym, n_modes, n_batch), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_sym, n_modes, n_batch), jnp.float32),
            jax.ShapeDtypeStruct((n_modes, n_batch, width), jnp.float32),
            jax.ShapeDtypeStruct((n_modes, n_batch, width), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_modes, n_batch, width), jnp.float32),
            pltpu.VMEM((n_modes, n_batch, width), jnp.float32),
        ],
        interpret=interpret,
    )(w_re, w_im, rp_re, rp_im, const_re.reshape(1, -1),
      const_im.reshape(1, -1), aux.reshape(1, -1), hf_re, hf_im)


@partial(jax.jit,
         static_argnames=("n_taps", "sps", "mu", "n_train", "block", "alg",
                          "qam_grid", "interpret"))
def _mimo_eq_run_batch(sig_re, sig_im, ref_re, ref_im, const_re, const_im,
                       aux, h0_re, h0_im, n_taps, sps, mu, n_train,
                       block=256, alg="lms", qam_grid=None, interpret=False):
    """sig_*: (B, N, n_modes) f32 planes; ref_*: (B, nSym, n_modes)."""
    n_batch, _, n_modes = sig_re.shape
    n_sym = ref_re.shape[1]
    n_blocks = int(np.ceil(n_sym / block))
    n_pad_sym = n_blocks * block
    l_pad = n_taps // 2
    width = n_modes * n_taps

    def windows(x):  # (B, N, 2) -> (n_pad_sym, B, width)
        from opticommpy_tpu.kernels._util import sliding_windows

        xp = jnp.pad(x, ((0, 0), (l_pad, l_pad + sps + n_taps
                                  + n_pad_sym * sps - x.shape[1]), (0, 0)))
        # build only the n_sym live rows, then zero-pad the tail block:
        # rows just past n_sym can still cover real signal-tail samples,
        # and a non-zero phantom window would update H past the last
        # symbol — something the scan path never does
        w = sliding_windows(xp, n_sym, sps, n_taps, axis=1)
        w = w.reshape(n_batch, n_sym, width).transpose(1, 0, 2)
        return jnp.pad(w, ((0, n_pad_sym - n_sym), (0, 0), (0, 0)))

    w_re = windows(sig_re)
    w_im = windows(sig_im)
    # refs to (n_pad_sym, n_modes, B): mode on sublanes, batch on lanes
    rp_re = jnp.pad(ref_re, ((0, 0), (0, n_pad_sym - n_sym), (0, 0)))
    rp_im = jnp.pad(ref_im, ((0, 0), (0, n_pad_sym - n_sym), (0, 0)))
    rp_re = rp_re.transpose(1, 2, 0)
    rp_im = rp_im.transpose(1, 2, 0)
    h0_re = h0_re.transpose(1, 0, 2)  # (n_modes, B, width)
    h0_im = h0_im.transpose(1, 0, 2)

    out_re, out_im, h_re, h_im = _mimo_eq_run_batch_windows(
        w_re, w_im, rp_re, rp_im, const_re, const_im, aux, h0_re, h0_im,
        n_modes, mu, n_train, block, alg, qam_grid, interpret)
    # (n_pad_sym, M, B) -> (B, n_sym, M); (M, B, width) -> (B, M, width)
    out_re = out_re[:n_sym].transpose(2, 0, 1)
    out_im = out_im[:n_sym].transpose(2, 0, 1)
    return out_re, out_im, h_re.transpose(1, 0, 2), h_im.transpose(1, 0, 2)


def mimo_eq_pallas_batch(sig, symb_ref, const, alg="lms", n_taps=15, sps=2,
                         mu=2e-3, n_train=10000, block=256, H0=None,
                         interpret=False):
    """Batched Pallas NxN adaptive equalizer: B signals in one kernel pass.

    Same per-signal math as :func:`mimo_eq_pallas` (each signal's recurrence
    is independent), with the batch packed on the vector sublane axis — the
    multi-channel (WDM serving) shape of the adaptive stage.

    Parameters
    ----------
    sig : (B, N, 2) complex signals at ``sps`` samples/symbol.
    symb_ref : (B, nSym, 2) reference symbols (None for blind 'cma'/'rde').
    H0 : optional (B, 2, 2, n_taps) initial taps (default: central spike).

    Returns
    -------
    (y (B, nSym, 2) complex, H (B, 2, 2, n_taps)).
    """
    sig_re, sig_im = split_ri(sig)
    const = np.asarray(const).astype(np.complex64)
    n_batch, _, n_modes = sig_re.shape
    if symb_ref is None:
        if alg in ("lms", "nlms", "da-rde"):
            raise ValueError(
                "symb_ref is required for alg='lms'/'nlms'/'da-rde'")
        n_sym = sig_re.shape[1] // sps
        ref_re = ref_im = jnp.zeros((n_batch, n_sym, n_modes),
                                    dtype=jnp.float32)
    else:
        ref_re, ref_im = split_ri(symb_ref)
    if H0 is None:
        h0 = np.zeros((n_batch, n_modes, n_modes, n_taps), dtype=np.complex64)
        h0[:, np.arange(n_modes), np.arange(n_modes), n_taps // 2] = 1.0
    else:
        h0 = np.asarray(H0).astype(np.complex64)
    h0_flat = h0.transpose(0, 1, 3, 2).reshape(n_batch, n_modes,
                                               n_modes * n_taps)

    if alg == "cma":
        r_cma = np.mean(np.abs(const) ** 4) / np.mean(np.abs(const) ** 2)
        aux = np.array([r_cma], dtype=np.float32)
    elif alg == "rde":
        aux = np.unique(np.round(np.abs(const), 6)).astype(np.float32)
    else:
        aux = np.zeros(1, dtype=np.float32)

    qam_grid = _square_qam_levels(const.real, const.imag)
    block = auto_block(n_batch, n_modes * n_taps, int(block))
    out_re, out_im, h_re, h_im = _mimo_eq_run_batch(
        sig_re, sig_im, ref_re, ref_im,
        jnp.asarray(const.real), jnp.asarray(const.imag), jnp.asarray(aux),
        jnp.asarray(h0_flat.real), jnp.asarray(h0_flat.imag),
        int(n_taps), int(sps), float(mu), int(n_train), int(block), str(alg),
        qam_grid, bool(interpret),
    )
    y = out_re + 1j * out_im
    h = (h_re + 1j * h_im).reshape(n_batch, n_modes, n_taps,
                                   n_modes).transpose(0, 1, 3, 2)
    return y, h
