"""Bit-array <-> decimal conversions (MSB-first), fully vectorized.

Behavioral parity with reference ``optic/utils.py:200-279`` (dec2bitarray /
bitarray2dec). The reference loops in Python per integer; here both directions
are single broadcasted integer ops that vectorize on the VPU and batch freely.
"""

import jax.numpy as jnp
import numpy as np


def dec2bitarray(x, bit_width):
    """Convert non-negative integer(s) to MSB-first bit arrays.

    Parameters
    ----------
    x : int or integer array of shape (N,)
    bit_width : int
        Number of bits per integer.

    Returns
    -------
    (bit_width,) array for scalar input, (N, bit_width) otherwise (int32).
    """
    shifts = jnp.arange(bit_width - 1, -1, -1, dtype=jnp.int32)
    scalar = np.isscalar(x) or getattr(x, "ndim", 0) == 0
    xa = jnp.atleast_1d(jnp.asarray(x, dtype=jnp.int32))
    bits = (xa[:, None] >> shifts[None, :]) & 1
    return bits[0] if scalar else bits


def bitarray2dec(bits):
    """Convert MSB-first bit array(s) to decimal integers.

    For a 1-D input returns a scalar; for a 2-D input of shape
    (bit_width, N) converts each *column* (matching the reference usage
    ``bitarray2dec(bits.reshape(-1, b).T)`` in modulateGray).
    """
    bits = jnp.asarray(bits, dtype=jnp.int32)
    w = bits.shape[0]
    weights = (1 << jnp.arange(w - 1, -1, -1, dtype=jnp.int32))
    if bits.ndim == 1:
        return jnp.sum(bits * weights)
    return jnp.sum(bits * weights[:, None], axis=0)
