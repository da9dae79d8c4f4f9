"""Fused Pallas TPU kernels for the quasi-cyclic LDPC BP iteration.

The round-2 QC decoder (comm/fec_qc.py) lowered the DVB-S2 permutations to
XLA slice+concat rolls; profiling put that roll machinery at ~1.7 of the
~2.4 ms/iteration (R4/5, B=128, bf16) because every (Z=360, B) plane is
re-streamed through HBM once per roll — and 360-row slice+concat pairs are
sublane-UNALIGNED copies for most shifts. These kernels keep whole planes
VMEM-resident and do the rolls as in-register dynamic rotates
(``pltpu.roll`` with a scalar-prefetched shift table), so each tensor moves
through HBM exactly once per iteration:

- **check kernel** (`grid over check columns a0`): reads the S relevant
  variable-total planes of T (scalar-prefetched *plane index* maps — the
  QC structure says which group feeds which column), rolls them into check
  alignment in VMEM, forms the v2c messages ``x = tot - M`` on the fly
  (X is never materialized in HBM), runs the exact two-min min-sum
  leave-one-out update, and writes the new check messages M plus a
  per-column parity vote.
- **variable kernel** (`grid over variable groups, one call per degree
  bucket`): gathers each group's d check-message planes (prefetched index
  maps), rolls them back to variable alignment, and accumulates the new
  totals T in f32 — folding in the converged-codeword output freeze.

Together with the carry reformulation in
:func:`opticommpy_tpu.comm.fec_qc.make_qc_decoder` (carry ``(M, T, Tp)``
instead of the edge tensor X) this cuts per-iteration HBM traffic from
~5 re-streams of the edge tensor to one read + one write of M plus one
pass over the (much smaller) totals.

Batch layout: every batch tensor is TILED as ``(nb * planes, Z, bt)`` with
``B = nb * bt`` — Pallas TPU requires a block's lane dimension to be a
multiple of 128 or the FULL array dimension, so the batch tile must be the
array's true last axis, not a slice of it. ``nb`` rides the leading grid
dimension. The tile width comes from the VMEM budget (high-S rates like
R9/10 don't fit S+2 full-width planes twice-buffered).

Mosaic v5e limits found building this (see CLAUDE.md): dynamic rotate is
32-bit only — cast bf16 planes to f32 BEFORE ``pltpu.roll`` (lossless),
mirroring the bf16-compare restriction.

Reference semantics: min-sum / normalized-min-sum belief propagation with
early-exit freezing, /root/reference/optic/comm/fec.py:505 and :684. The
bit-level check-update semantics match kernels/ldpc_pallas.py (two-min
exclusive minimum == prefix/suffix exclusive minimum, exactly).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Z = 360  # ETSI EN 302 307-1 cyclic group size


_VMEM_TARGET = 28 * 2**20  # raised scoped-vmem limit we are willing to ask for


def _check_vmem_need(S, msize, tsize, bt):
    """Check-kernel VMEM bytes at batch tile ``bt``.

    Mosaic pads the lane (last) dimension to 128, so tiles below 128 cost
    the same VMEM as 128 — the only way down is fewer planes, not a
    narrower batch. Inputs and outputs are double-buffered by the pallas
    pipeline; scratch is single."""
    D = S + 2
    eff = max(bt, 128)
    ins = (S + 2) * Z * eff * tsize + D * Z * eff * msize
    outs = D * Z * eff * msize + 8 * eff * 4
    scratch = D * Z * eff * msize + 4 * Z * eff * 4
    return 2 * (ins + outs) + scratch


def pick_bt(B, S, msize, tsize):
    """Batch tile for the fused QC kernels.

    Below 128 the lane padding makes every tile cost the same VMEM, so a
    batch <= 128 runs as one chunk; above, 128 — measured on v5e, wider
    tiles are SLOWER (R4/5 B=256 bf16: 241 Mbit/s at bt=256 vs 266 at
    bt=128; the deeper per-step VMEM working set costs more than the
    halved step count saves)."""
    b8 = B + (-B) % 8
    return min(b8, 128)


def tile_batch(x, nb, bt):
    """(P, Z, B) -> (nb * P, Z, bt): batch chunk b owns planes [b*P, (b+1)*P)."""
    if nb == 1:
        return x
    P = x.shape[0]
    return x.reshape(P, Z, nb, bt).transpose(2, 0, 1, 3).reshape(
        nb * P, Z, bt)


def untile_batch(x, nb, bt):
    """Inverse of :func:`tile_batch`."""
    if nb == 1:
        return x
    P = x.shape[0] // nb
    return x.reshape(nb, P, Z, bt).transpose(1, 2, 0, 3).reshape(
        P, Z, nb * bt)


# ---------------------------------------------------------------------------
# check-column kernel
# ---------------------------------------------------------------------------


def _check_body(pos_ref, sh_ref, *refs, S, q, alpha, mdt):
    """One check column a0 of one batch chunk (grid: (nb, a0)).

    refs = S T-planes, tp, tp_prev, m  |  m_new, par  |  x_scr, m1, m2,
    parx, partot (scratch). All math f32 (Mosaic v5e rejects bf16 vector
    compares AND bf16 dynamic rotates); storage casts are exact for
    min/sign.
    """
    D = S + 2
    t_refs = refs[:S]
    tp_ref, tpm1_ref, m_ref = refs[S], refs[S + 1], refs[S + 2]
    mnew_ref, par_ref = refs[S + 3], refs[S + 4]
    x_scr, m1_ref, m2_ref, parx_ref, partot_ref = refs[S + 5:]

    i = pl.program_id(1)
    bt = m_ref.shape[-1]
    row0 = jax.lax.broadcasted_iota(jnp.int32, (Z, bt), 0) == 0

    def slot_x(sl):
        """(x32, tot_neg) for slot sl (rolled totals minus messages)."""
        if sl < S:
            # cast BEFORE the roll: Mosaic's dynamic rotate is 32-bit
            # only ("Rotate with non-32-bit data"); bf16->f32 is lossless
            tot32 = pltpu.roll(
                t_refs[sl][0].astype(jnp.float32), sh_ref[sl, i], axis=0)
            mask0 = None
        elif sl == S:  # accumulator self edge p_j -> c_j
            tot32 = tp_ref[0].astype(jnp.float32)
            mask0 = None
        else:  # staircase p_{j-1} -> c_j; check 0 has no p_{-1}
            first = i == 0
            tot32 = pltpu.roll(
                tpm1_ref[0].astype(jnp.float32),
                jnp.where(first, 1, 0), axis=0)
            mask0 = row0 & first
        x32 = tot32 - m_ref[sl, 0].astype(jnp.float32)
        if mdt == jnp.bfloat16:
            x32 = x32.astype(mdt).astype(jnp.float32)
        tot_neg = tot32 < 0
        if mask0 is not None:
            x32 = jnp.where(mask0, jnp.inf, x32)
            tot_neg = tot_neg & ~mask0
        return x32, tot_neg

    # pass 1: two smallest |x|, sign parities. Four INDEPENDENT two-min
    # chains merged by a tree — the naive single chain serializes every
    # slot behind a 3-op dependency and starves the VPU of ILP.
    NCH = 4
    c_m1 = [None] * NCH
    c_m2 = [None] * NCH
    c_px = [None] * NCH
    c_pt = [None] * NCH
    for sl in range(D):
        x32, tot_neg = slot_x(sl)
        x_scr[sl] = x32.astype(mdt)
        mag = jnp.abs(x32)
        sx = (x32 < 0).astype(jnp.int32)
        st = tot_neg.astype(jnp.int32)
        c = sl % NCH
        if c_m1[c] is None:
            c_m1[c], c_m2[c] = mag, jnp.full((Z, bt), jnp.inf, jnp.float32)
            c_px[c], c_pt[c] = sx, st
        else:
            c_m2[c] = jnp.minimum(c_m2[c], jnp.maximum(c_m1[c], mag))
            c_m1[c] = jnp.minimum(c_m1[c], mag)
            c_px[c] = c_px[c] ^ sx
            c_pt[c] = c_pt[c] ^ st

    for c in range(NCH):  # neutral fill (D = S+2 >= 4 for all DVB-S2)
        if c_m1[c] is None:
            c_m1[c] = jnp.full((Z, bt), jnp.inf, jnp.float32)
            c_m2[c] = jnp.full((Z, bt), jnp.inf, jnp.float32)
            c_px[c] = jnp.zeros((Z, bt), jnp.int32)
            c_pt[c] = jnp.zeros((Z, bt), jnp.int32)

    def merge2(a1, a2, b1, b2):
        return (jnp.minimum(a1, b1),
                jnp.minimum(jnp.minimum(a2, b2), jnp.maximum(a1, b1)))

    u1, u2 = merge2(c_m1[0], c_m2[0], c_m1[1], c_m2[1])
    v1, v2 = merge2(c_m1[2], c_m2[2], c_m1[3], c_m2[3])
    w1, w2 = merge2(u1, u2, v1, v2)
    m1_ref[...] = w1
    m2_ref[...] = w2
    parx_ref[...] = (c_px[0] ^ c_px[1]) ^ (c_px[2] ^ c_px[3])
    partot_ref[...] = (c_pt[0] ^ c_pt[1]) ^ (c_pt[2] ^ c_pt[3])

    # per-column parity vote, AND-accumulated across columns (sequential
    # grid; the (8, bt) block is revisited for every a0 at fixed chunk b)
    ok = jnp.broadcast_to(
        jnp.all(partot_ref[...] == 0, axis=0, keepdims=True), (8, bt)
    ).astype(jnp.float32)
    par_ref[...] = jnp.where(i == 0, ok, jnp.minimum(par_ref[...], ok))

    # pass 2: exclusive min + leave-one-out sign from the two-min state
    m1 = m1_ref[...]
    m2 = m2_ref[...]
    for sl in range(D):
        x32 = x_scr[sl].astype(jnp.float32)
        om = jnp.where(jnp.abs(x32) == m1, m2, m1)
        if alpha is not None:
            om = om * alpha
        flip = (parx_ref[...] ^ (x32 < 0).astype(jnp.int32)) == 1
        mnew_ref[sl, 0] = jnp.where(flip, -om, om).astype(mdt)


def check_column_update(T, Tp, M, pos_tab, sh_tab, G, *, alpha=None,
                        interpret=False):
    """All check columns' message update + parity vote (tiled batch layout).

    T: (nb*G, Z, bt) variable totals (message dtype), bucket order.
    Tp: (nb*q, Z, bt) parity totals (message dtype).
    M: (S+2, nb*q, Z, bt) check-aligned messages.
    pos_tab/sh_tab: (S, q) int32 — T plane index / roll amount per column.
    Returns (M_new like M, ok (nb*8, bt) f32 vote — rows ::8 are the
    parity vote of the totals, i.e. of the PREVIOUS iteration's decision).
    """
    S, q = pos_tab.shape
    D = S + 2
    bt = M.shape[-1]
    nb = M.shape[1] // q
    mdt = M.dtype

    def t_spec(j):
        return pl.BlockSpec(
            (1, Z, bt), lambda b, i, pos, sh, j=j: (b * G + pos[j, i], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, q),
        in_specs=(
            [t_spec(j) for j in range(S)]
            + [
                pl.BlockSpec(
                    (1, Z, bt), lambda b, i, pos, sh: (b * q + i, 0, 0)),
                pl.BlockSpec(
                    (1, Z, bt),
                    lambda b, i, pos, sh: (b * q + (i + q - 1) % q, 0, 0)),
                pl.BlockSpec(
                    (D, 1, Z, bt),
                    lambda b, i, pos, sh: (0, b * q + i, 0, 0)),
            ]
        ),
        out_specs=[
            pl.BlockSpec(
                (D, 1, Z, bt), lambda b, i, pos, sh: (0, b * q + i, 0, 0)),
            pl.BlockSpec((8, bt), lambda b, i, pos, sh: (b, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, Z, bt), mdt),
            pltpu.VMEM((Z, bt), jnp.float32),
            pltpu.VMEM((Z, bt), jnp.float32),
            pltpu.VMEM((Z, bt), jnp.int32),
            pltpu.VMEM((Z, bt), jnp.int32),
        ],
    )
    msz = jnp.dtype(mdt).itemsize
    tsz = jnp.dtype(T.dtype).itemsize
    # measured actuals run ~1.4x the model (outputs/scratch buffering);
    # request generous headroom — the 16 MB default is a soft scoped
    # limit, the physical VMEM is far larger
    need = int(_check_vmem_need(S, msz, tsz, bt) * 1.5)
    m_new, par = pl.pallas_call(
        partial(_check_body, S=S, q=q, alpha=alpha, mdt=mdt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((D, nb * q, Z, bt), mdt),
            jax.ShapeDtypeStruct((nb * 8, bt), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 2**20, int(need * 1.2))),
        # (limit = 1.8x the analytic model overall; R9/10 measured 18.8M
        # against a 20.1M model, bt=256 R4/5 measured 33.4M against 23.6M)
        interpret=interpret,
    )(pos_tab, sh_tab, *([T] * S), Tp, Tp, M)
    return m_new, par


# ---------------------------------------------------------------------------
# variable-group kernel (one call per degree bucket)
# ---------------------------------------------------------------------------


def _var_body(sl_ref, col_ref, sh_ref, *refs, d, P, tdt):
    """A strip of P variable groups of one batch chunk (grid: (nb, strip)).
    refs = P*d M-planes, llr, fT_old, freeze | T_new, fT_new [, T_copy].

    Strip-mining amortizes the per-grid-step pipeline sequencing: the
    variable side is DMA-latency bound at one group per step (144 steps x
    ~9 small plane fetches for R4/5), so each step handles P groups."""
    i = pl.program_id(1)
    m_refs = refs[:P * d]
    llr_ref, ftold_ref, freeze_ref = refs[P * d], refs[P * d + 1], refs[P * d + 2]
    tnew_ref, ftnew_ref = refs[P * d + 3], refs[P * d + 4]
    tcopy_ref = refs[P * d + 5] if len(refs) > P * d + 5 else None

    frozen = freeze_ref[0:1, :] > 0.5  # (1, bt) -> broadcast over Z
    for p in range(P):
        acc = llr_ref[0, p].astype(jnp.float32)
        for j in range(d):
            # f32 cast BEFORE the roll (Mosaic dynamic rotate is 32-bit
            # only); shift table is (P*d, n_strips) with row p*d+j
            acc = acc + pltpu.roll(
                m_refs[p * d + j][0, 0].astype(jnp.float32),
                sh_ref[p * d + j, i], axis=0)
        tnew_ref[0, p] = acc
        ftnew_ref[0, p] = jnp.where(frozen, ftold_ref[0, p], acc)
        if tcopy_ref is not None:
            tcopy_ref[0, p] = acc.astype(tdt)


def var_totals_update(M_info, llr, fT_old, freeze, buckets, sl_tabs,
                      col_tabs, sh_tabs, G, q, *, msg_copy=False,
                      interpret=False):
    """New variable totals T (f32) + frozen outputs, per degree bucket.

    M_info: (S, nb*q, Z, bt) check messages (info slots).
    llr/fT_old: (nb*G, Z, bt) f32, bucket order. freeze: (nb*8, bt) f32.
    buckets: ((d, ng), ...); sl/col/sh tabs: per bucket (d, ng) int32 —
    slot index, column index, back-roll of each group entry.
    Returns (T_new f32, fT_new f32[, T_copy in M's dtype]) with planes in
    (chunk, bucket-order group) layout.
    """
    bt = M_info.shape[-1]
    nb = M_info.shape[1] // q
    mdt = M_info.dtype
    llr4 = llr.reshape(nb, G, Z, bt)
    fT4 = fT_old.reshape(nb, G, Z, bt)

    outs = []
    off = 0
    msz = jnp.dtype(mdt).itemsize
    for (d, ng), slt, colt, sht in zip(buckets, sl_tabs, col_tabs, sh_tabs):
        # strip size: several groups per grid step amortize the per-step
        # pipeline sequencing (the variable side is DMA-latency bound at
        # one group/step). P must divide the bucket size AND the bucket
        # offset (block-index alignment of the llr/fT views), and the
        # strip's double-buffered working set must fit the raised
        # scoped-vmem budget.
        def v_need(P):
            ins = P * d * Z * bt * msz + 2 * P * Z * bt * 4
            outs = P * Z * bt * (4 + 4 + (msz if msg_copy else 0))
            return 2 * (ins + outs)

        P = 1
        for cand in range(2, 9):
            if (ng % cand == 0 and off % cand == 0 and cand * d <= 24
                    and v_need(cand) * 1.5 <= 30 * 2**20):
                P = cand
        ns = ng // P
        vlim = max(16 * 2**20, int(v_need(P) * 1.5))

        def strip_tab(t):
            # (d, ng) -> (P*d, ns): row p*d+j at strip s = t[j, s*P+p].
            # Pure jnp: the tables may be TRACERS when the decoder builder
            # first runs inside an outer jit trace (jnp.asarray of numpy
            # binds a constant under the active trace).
            return jnp.reshape(
                jnp.transpose(jnp.reshape(t, (d, ns, P)), (2, 0, 1)),
                (P * d, ns))

        slt_s, colt_s, sht_s = strip_tab(slt), strip_tab(colt), strip_tab(sht)

        def m_spec(j):
            return pl.BlockSpec(
                (1, 1, Z, bt),
                lambda b, i, s, c, sh, j=j: (s[j, i], b * q + c[j, i], 0, 0))

        def g_spec(off=off, P=P):
            # bucket slice of the (nb, G, Z, bt) llr / fT views
            return pl.BlockSpec(
                (1, P, Z, bt),
                lambda b, i, s, c, sh: (b, off // P + i, 0, 0))

        def o_spec(P=P):
            return pl.BlockSpec(
                (1, P, Z, bt), lambda b, i, s, c, sh: (b, i, 0, 0))

        out_specs = [o_spec(), o_spec()]
        out_shape = [
            jax.ShapeDtypeStruct((nb, ng, Z, bt), jnp.float32),
            jax.ShapeDtypeStruct((nb, ng, Z, bt), jnp.float32),
        ]
        if msg_copy:
            out_specs.append(o_spec())
            out_shape.append(jax.ShapeDtypeStruct((nb, ng, Z, bt), mdt))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb, ns),
            in_specs=(
                [m_spec(j) for j in range(P * d)]
                + [
                    g_spec(),
                    g_spec(),
                    pl.BlockSpec((8, bt), lambda b, i, s, c, sh: (b, 0)),
                ]
            ),
            out_specs=out_specs,
        )
        outs.append(pl.pallas_call(
            partial(_var_body, d=d, P=P, tdt=mdt),
            grid_spec=grid_spec,
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
            interpret=interpret,
        )(slt_s, colt_s, sht_s, *([M_info] * (P * d)), llr4, fT4, freeze))
        off += ng

    nouts = 3 if msg_copy else 2
    merged = []
    for oi in range(nouts):
        # per-bucket (nb, ng, Z, bt) chunks -> (nb*G, Z, bt) plane order
        merged.append(
            jnp.concatenate([o[oi] for o in outs], axis=1).reshape(
                -1, Z, bt))
    return tuple(merged)
