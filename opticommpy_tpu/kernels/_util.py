"""Shared helpers for the Pallas kernel wrappers."""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["auto_block", "sliding_windows", "split_ri"]


def sliding_windows(xp, n_out, sps, n_taps, axis=0, taps_first=False):
    """Tap windows ``w[.., k, t, ..] = xp[.., k*sps + t, ..]`` along ``axis``.

    Returns xp's shape with dim ``axis`` replaced by ``(n_out, n_taps)``
    (or ``(n_taps, n_out)`` with ``taps_first=True`` — the shifted-copy
    layout the NLIN lag products use). Built as ``n_taps`` strided slices
    + stack (pure streaming copies). The equivalent ``xp[idx]`` index
    gather produces the IDENTICAL array but costs ~6.5 ms at
    (65536, 15, 2) c64 on the v5e backend (round-5 measurement; same
    pathology as the NLIN shifted-copy gathers, which ran at ~0.6 GB/s)
    while the slice form sits at the dispatch floor. Requires
    ``xp.shape[axis] >= (n_out - 1) * sps + n_taps`` (same as the gather
    form).
    """
    axis = axis % xp.ndim  # a negative axis would silently stack at 0
    lim0 = (n_out - 1) * sps + 1
    strides = [1] * xp.ndim
    strides[axis] = sps
    cols = []
    for t in range(n_taps):
        starts = [0] * xp.ndim
        limits = list(xp.shape)
        starts[axis] = t
        limits[axis] = t + lim0
        cols.append(jax.lax.slice(xp, starts, limits, strides))
    return jnp.stack(cols, axis=axis if taps_first else axis + 1)


def auto_block(sublanes, lane_dim, block=256, budget=12 * 2**20, floor=32):
    """Cap a recurrence kernel's symbol-block size to fit scoped VMEM.

    The double-buffered (block, sublanes, lane_dim) window inputs dominate
    a batched recurrence kernel's scoped-VMEM footprint, and the lane axis
    pads to 128 — so narrow widths do NOT save memory and a batch that
    rides the sublane axis multiplies it (B=32 at block=256 blew the 16 MB
    scoped limit in the batched MIMO trainer; lesson first learned with the
    batched DFE). Halve ``block`` until the re+im window pair, double
    buffered (4 f32 buffers of block*sublanes*lanes), fits in ``budget``
    bytes — 12 MB leaves ~4 MB of the 16 MB scoped limit for refs,
    outputs, and state scratch.
    """
    lanes = max(128, -(-lane_dim // 128) * 128)
    # sublanes pad to the 8-row f32 tile just like lanes pad to 128; a
    # 2-sublane window really occupies 8 rows of VMEM (modeling the raw
    # count under-estimates the footprint up to 8x — same hardware-vs-
    # interpret blindness class as lane-slice legality)
    sub_rows = max(8, -(-sublanes // 8) * 8)
    per_row = sub_rows * lanes * 4
    b = block
    while b > floor and b * per_row * 4 > budget:
        b //= 2
    return b


@jax.jit
def _split_device(z):
    return (jnp.real(z).astype(jnp.float32), jnp.imag(z).astype(jnp.float32))


def split_ri(x):
    """Real/imag float32 parts of ``x`` without a complex host->device copy.

    Some TPU runtimes (e.g. the tunneled backend in this environment) do not
    implement complex host<->device transfers. Host arrays are split in
    NumPy and transferred as two float32 planes; device arrays are split by
    one tiny jitted program (no host round trip either way).
    """
    if isinstance(x, np.ndarray) or np.isscalar(x):
        x = np.asarray(x)
        return (jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32)),
                jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32)))
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        return x.astype(jnp.float32), jnp.zeros_like(x, dtype=jnp.float32)
    return _split_device(x)
