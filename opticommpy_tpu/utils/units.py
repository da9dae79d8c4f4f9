"""Scalar unit conversions and numerically-stable helpers.

Behavioral parity with the reference ``optic/utils.py:149-358`` (lin2dB,
dB2lin, dBm2W, ber2Qfactor, llr2bitProb), re-expressed as vectorized JAX ops
(the reference JIT-compiles llr2bitProb with Numba; here XLA fuses the
stable-sigmoid elementwise graph on the VPU).
"""

import jax.numpy as jnp
from jax.scipy.special import erfinv


def lin2db(x):
    """Convert a linear value to dB: ``10*log10(x)``."""
    return 10.0 * jnp.log10(x)


def db2lin(x):
    """Convert dB to a linear value: ``10**(x/10)``."""
    return 10.0 ** (x / 10.0)


def dbm2w(x):
    """Convert power in dBm to Watts."""
    return 1e-3 * 10.0 ** (x / 10.0)


def w2dbm(x):
    """Convert power in Watts to dBm."""
    return 10.0 * jnp.log10(x / 1e-3)


def ber2qfactor(ber):
    """Convert a bit error rate to a Q factor in dB.

    Q = sqrt(2) * erfcinv(2*ber); returned as ``10*log10(Q)``
    (reference ``optic/utils.py:312``). Uses erfcinv(y) = erfinv(1-y).
    """
    q = jnp.sqrt(2.0) * erfinv(1.0 - 2.0 * ber)
    return 10.0 * jnp.log10(q)


def llr2bit_prob(llr):
    """Convert LLRs to bit probabilities P(bit=1) with a stable sigmoid.

    Parity with reference ``optic/utils.py:329`` (llr2bitProb): the LLR
    convention is ``llr = log(P(b=0)/P(b=1))``, so ``P(b=1) = sigmoid(-llr)``.
    """
    x = -llr
    # numerically stable sigmoid, fully vectorized
    z = jnp.exp(-jnp.abs(x))
    return jnp.where(x >= 0, 1.0 / (1.0 + z), z / (1.0 + z))
