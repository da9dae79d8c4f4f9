"""Shared helpers for the Pallas kernel wrappers."""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["auto_block", "split_ri"]


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
