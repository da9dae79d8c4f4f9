"""Shared helpers for the Pallas kernel wrappers."""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["split_ri"]


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
