"""Pallas TPU kernel: one full BP iteration of the lifted-circulant decoder.

The lift decoder's XLA iteration (comm/fec_lift.py) is op-overhead-bound:
~350 per-edge slice/concat rolls + stacks per iteration move each (L, B)
plane through HBM several times at small-op granularity (v5e stage
profile: the min-sum check update itself is <2% of the iteration; block
gathers measured SLOWER than the slice rolls — see CLAUDE.md round-5
probe). This kernel runs the WHOLE iteration for a batch tile in one
program: messages and totals live in VMEM, every cyclic permutation is a
static ``pltpu.roll`` (free-ish), and each tensor moves through HBM once
per iteration.

Semantics: flooding min-sum / normalized min-sum, message storage in
``bf16`` or ``f32``, parity flags from the mdt-cast check-aligned totals
— hard decisions and iteration counts are identical to the XLA path (the
rounding points are mirrored: messages round to the storage dtype after
the NMSA scale, totals round at the v2c cast); soft totals match to f32
sum-order tolerance (the kernel accumulates T in check-bucket order, the
XLA path in variable-bucket order). Reference decode semantics:
/root/reference/optic/comm/fec.py:505 (minSumAlgorithm), :735
(decodeLDPC iteration loop).

Supported lifts: any ``lift_tables`` code whose lift size L is a
multiple of 8 (f32 sublane tile). AR4JA (Q in {128, 512, 2048}) is;
802.11n (Z in {27, 54, 81}) is not — it stays on the XLA path.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sroll(x, sh, L):
    """Static cyclic roll by sh on axis 0 (== np.roll), free on Mosaic."""
    sh = int(sh) % L
    if sh == 0:
        return x
    return pltpu.roll(x, sh, axis=0)


def _msa_group(xs, alpha, mdt):
    """Leave-one-out min-sum over a check group's d (L, bt) f32 planes.

    Mirrors fec_qc._check_msa_slots (prefix/suffix exclusive min, parity
    of the OTHER slots' signs) + the NMSA scale + the message-storage
    rounding, so downstream decisions match the XLA path exactly.
    """
    d = len(xs)
    mag = [jnp.abs(x) for x in xs]
    inf = jnp.full_like(mag[0], jnp.inf)
    fe = []
    acc = inf
    for i in range(d):
        fe.append(acc)
        acc = jnp.minimum(acc, mag[i])
    be = [None] * d
    acc = inf
    for i in range(d - 1, 0, -1):
        be[i] = acc
        acc = jnp.minimum(acc, mag[i])
    be[0] = acc
    neg = [x < 0 for x in xs]
    par = neg[0]
    for i in range(1, d):
        par = par ^ neg[i]
    out = []
    for i in range(d):
        om = jnp.minimum(fe[i], be[i])
        if alpha is not None:
            om = om * alpha
        m = jnp.where(par ^ neg[i], -om, om)
        if mdt == jnp.bfloat16:
            # storage rounding (the XLA path stores messages in mdt)
            m = m.astype(jnp.bfloat16).astype(jnp.float32)
        out.append(m)
    return out


def _iter_body(x_ref, llr_ref, xo_ref, t_ref, ok_ref, m_ref, *, chk_buckets,
               ev_tabs, esh_tabs, L, V, alpha, mdt):
    bt = x_ref.shape[-1]
    f32 = jnp.float32

    # T := llr (accumulated in place in the output ref)
    for v in range(V):
        t_ref[v] = llr_ref[v]

    # pass 1: per check group, leave-one-out messages (kept in the VMEM
    # scratch m_ref for pass 2); T += back-rolls
    off = 0
    for (d, ng), ev, esh in zip(chk_buckets, ev_tabs, esh_tabs):
        for ig in range(ng):
            xs = [x_ref[off + sl * ng + ig].astype(f32) for sl in range(d)]
            ms = _msa_group(xs, alpha, mdt)
            for sl in range(d):
                e = off + sl * ng + ig
                v = int(ev[sl, ig])
                bsh = (L - int(esh[sl, ig])) % L
                m_ref[e] = ms[sl]
                t_ref[v] = t_ref[v] + _sroll(ms[sl], bsh, L)
        off += d * ng

    # pass 2: new extrinsic carry X' = mdt(roll(T)) - M, plus the parity
    # flags from the mdt-cast rolled totals
    ok = jnp.zeros((1, bt), jnp.float32) == 0.0
    off = 0
    for (d, ng), ev, esh in zip(chk_buckets, ev_tabs, esh_tabs):
        for ig in range(ng):
            par = None
            for sl in range(d):
                e = off + sl * ng + ig
                v = int(ev[sl, ig])
                tot = _sroll(t_ref[v], int(esh[sl, ig]), L)
                totm = tot.astype(mdt).astype(f32)
                xo_ref[e] = (totm - m_ref[e]).astype(mdt)
                neg = totm < 0
                par = neg if par is None else par ^ neg
            # check group satisfied iff every row's parity is even
            bad = jnp.max(par.astype(f32), axis=0, keepdims=True)  # (1, bt)
            ok = ok & (bad < 0.5)
        off += d * ng
    ok_ref[...] = jnp.broadcast_to(ok.astype(jnp.int32), ok_ref.shape)


def _vmem_need(E, L, V, bt, msize):
    """Compile-time VMEM estimate: double-buffered refs + f32 scratch."""
    refs = 2 * E * L * bt * msize + 2 * V * L * bt * 4 + 8 * bt * 4
    return int(refs * 2.4) + E * L * bt * 4 + 2**23


def lift_budget_ok(mode, n, R, msg_dtype="bf16", bt=128):
    """True if the fused iteration kernel fits the ~100 MB VMEM budget."""
    from opticommpy_tpu.comm.fec_lift import lift_tables

    tb = lift_tables(mode, n, R)
    msize = 2 if msg_dtype == "bf16" else 4
    return _vmem_need(tb["E"], tb["L"], tb["V"], bt, msize) <= 100 * 2**20


@partial(jax.jit, static_argnames=("mode", "n", "R", "alg", "msg_dtype",
                                   "interpret", "bt"))
def lift_iter_pallas(X, llr_bo, *, mode, n, R, alg="NMSA",
                     msg_dtype="bf16", interpret=False, bt=None):
    """One flooding BP iteration: ``(X, llr) -> (X', T, ok)``.

    X : (E, L, B) check-aligned extrinsic totals (message dtype).
    llr_bo : (V, L, B) f32 channel LLRs in variable-bucket order.
    Returns the new carry X', the new totals T (f32, bucket order) and
    per-codeword parity flags ok (B,) bool.
    """
    from opticommpy_tpu.comm.fec_lift import lift_tables

    tb = lift_tables(mode, n, R)
    E, L, V = tb["E"], tb["L"], tb["V"]
    if L % 8 != 0:
        raise ValueError(f"lift size {L} not sublane-aligned (need L%8==0)")
    if alg not in ("MSA", "NMSA"):
        raise ValueError(f"pallas lift iteration supports MSA/NMSA, not {alg}")
    B = X.shape[-1]
    if bt is None:
        bt = B if interpret else min(B, 128)
    if B % bt != 0:
        raise ValueError(f"batch {B} not a multiple of the tile {bt}")
    mdt = jnp.bfloat16 if msg_dtype == "bf16" else jnp.float32
    alpha = 0.75 if alg == "NMSA" else None
    msize = 2 if msg_dtype == "bf16" else 4
    need = _vmem_need(E, L, V, bt, msize)
    if not interpret and need > 100 * 2**20:
        raise ValueError(
            f"lift kernel VMEM estimate {need / 2**20:.0f} MB exceeds the "
            f"~100 MB budget for {mode} n={n} at bt={bt}; use the XLA "
            "backend (make_lift_decoder backend='xla')")

    body = partial(_iter_body, chk_buckets=tb["chk_buckets"],
                   ev_tabs=tb["ev"], esh_tabs=tb["esh"], L=L, V=V,
                   alpha=alpha, mdt=mdt)
    Xn, T, ok = pl.pallas_call(
        body,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((E, L, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((V, L, bt), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((E, L, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((V, L, bt), lambda i: (0, 0, i)),
            pl.BlockSpec((8, bt), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, L, B), mdt),
            jax.ShapeDtypeStruct((V, L, B), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((E, L, bt), jnp.float32)],
        # _vmem_need already covers the double-buffered in/out blocks
        # plus the f32 message scratch and slack
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 2**20, need)),
        interpret=interpret,
    )(X.astype(mdt), llr_bo)
    return Xn, T, ok[0] != 0
