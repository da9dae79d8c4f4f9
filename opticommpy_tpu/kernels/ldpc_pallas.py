"""Pallas TPU kernel: LDPC leave-one-out check update over the slot axis.

The QC decoder's check update (fec_qc._check_msa_slots) is an exact
exclusive-min along the small leading slot axis D of the (D, q, Z, B)
message tensor. As XLA ops the prefix/suffix slab chain re-streams the
tensor ~5x through HBM (measured 1.68 ms/iter at DVB-S2 R4/5, B=128,
bf16); this kernel keeps a (D, rows, B) tile VMEM-resident and does the
whole leave-one-out + sign-parity in one read / one write.

Reference semantics: min-sum check-node update of
/root/reference/optic/comm/fec.py:505 (minSumAlgorithm), optionally
scaled by the NMSA factor. Bit-identical to fec_qc._check_msa_slots.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _msa_body(x_ref, m_ref, *, D, alpha):
    # all math in f32 in VMEM/registers (Mosaic on v5e rejects bf16 vector
    # compares); results are exactly representable in the storage dtype,
    # so the cast at the store is lossless and the kernel stays
    # bit-identical to the XLA slab chain
    x = x_ref[...].astype(jnp.float32)  # (D, rt, B)
    mag = jnp.abs(x)
    inf = jnp.full_like(mag[0], jnp.inf)
    fe = []  # fe[i] = min(mag[:i])
    acc = inf
    for i in range(D):
        fe.append(acc)
        acc = jnp.minimum(acc, mag[i])
    be = [None] * D  # be[i] = min(mag[i+1:])
    acc = inf
    for i in range(D - 1, 0, -1):
        be[i] = acc
        acc = jnp.minimum(acc, mag[i])
    be[0] = acc
    neg = x < 0
    par = neg[0]
    for i in range(1, D):
        par = par ^ neg[i]
    for i in range(D):
        om = jnp.minimum(fe[i], be[i])
        if alpha is not None:
            om = om * alpha
        m_ref[i] = jnp.where(par ^ neg[i], -om, om).astype(m_ref.dtype)


@partial(jax.jit, static_argnames=("alpha", "interpret"))
def check_update_msa_pallas(x, alpha=None, interpret=False):
    """Exclusive-min check update along axis 0 of ``x`` (D, q, Z, B).

    ``alpha``: optional normalized-min-sum scale (0.75 for 'NMSA').
    Matches :func:`opticommpy_tpu.comm.fec_qc._check_msa_slots` (and its
    NMSA wrapper) bit-exactly for f32/bf16 inputs.
    """
    D = x.shape[0]
    orig_shape = x.shape
    B = x.shape[-1]
    rows = int(np.prod(x.shape[1:-1]))
    xf = x.reshape(D, rows, B)
    # tile height: divide the (q*Z = 360q) row axis; kernel math is f32
    # regardless of storage dtype, so budget ~6 live f32 buffers (in + out
    # + prefix/suffix temporaries) inside the 16 MB VMEM
    def fits(cand):
        return D * cand * B * 4 * 6 <= 12 * 2**20

    rt = None
    for cand in (360, 240, 120, 40, 8):
        if rows % cand == 0 and fits(cand):
            rt = cand
            break
    if rt is None:
        raise ValueError(
            f"no VMEM-feasible row tile for rows={rows}, D={D}, B={B}: "
            f"even an 8-row tile needs {D * 8 * B * 4 * 6} bytes of the "
            f"~12 MB budget — reduce the batch size")
    out = pl.pallas_call(
        partial(_msa_body, D=D, alpha=alpha),
        grid=(rows // rt,),
        in_specs=[pl.BlockSpec((D, rt, B), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((D, rt, B), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((D, rows, B), x.dtype),
        interpret=interpret,
    )(xf)
    return out.reshape(orig_shape)
