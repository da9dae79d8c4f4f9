"""Random-key helpers.

The reference seeds numpy's global RNG inside Numba kernels
(``optic/dsp/core.py:758-763``), which is neither reproducible under JIT nor
parallelizable. Here every stochastic function takes an explicit
``jax.random`` key; this helper accepts either a key or a plain int seed so
call sites stay ergonomic.
"""

import jax


def ensure_key(key_or_seed):
    """Return a PRNG key from either a key or an integer seed."""
    if isinstance(key_or_seed, int):
        return jax.random.PRNGKey(key_or_seed)
    return key_or_seed
