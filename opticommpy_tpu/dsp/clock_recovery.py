"""Clock and timing recovery: Gardner TED + Farrow interpolator + PI loop/NCO.

TPU-native counterpart of reference ``optic/dsp/clockRecovery.py``. The NCO
loop is a true sequential recurrence with data-dependent pointer moves
(sample skip/stuff, clockRecovery.py:160-171); it runs as a ``lax.while_loop``
carrying the output buffer and loop-filter state, with masked scatter writes.
The drift estimator is a host-side analysis helper (scipy find_peaks).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import find_peaks

__all__ = [
    "ClockRecoveryConfig",
    "gardner_ted",
    "gardner_ted_nyquist",
    "interpolator",
    "gardner_clock_recovery",
    "calc_clock_drift",
]


@dataclass(frozen=True)
class ClockRecoveryConfig:
    """Gardner clock recovery parameters (clockRecovery.py:108-114 defaults)."""

    kp: float = 1e-3
    ki: float = 1e-6
    isNyquist: bool = True
    lpad: int = 1
    maxPPM: float = 500.0


def gardner_ted(x):
    """Gardner timing error on a 3-sample segment (clockRecovery.py:24)."""
    return jnp.real(jnp.conj(x[1]) * (x[2] - x[0]))


def gardner_ted_nyquist(x):
    """Modified Gardner TED for Nyquist pulses (clockRecovery.py:42)."""
    return jnp.abs(x[1]) ** 2 * (jnp.abs(x[0]) ** 2 - jnp.abs(x[2]) ** 2)


def interpolator(x, t):
    """Cubic Farrow interpolation over a 4-sample segment (clockRecovery.py:60)."""
    return (
        x[0] * (-1 / 6 * t**3 + 1 / 6 * t)
        + x[1] * (1 / 2 * t**3 + 1 / 2 * t**2 - t)
        + x[2] * (-1 / 2 * t**3 - t**2 + 1 / 2 * t + 1)
        + x[3] * (1 / 6 * t**3 + 1 / 2 * t**2 + 1 / 3 * t)
    )


@partial(jax.jit, static_argnames=("cfg", "n_out"))
def _gardner_one_mode(col, cfg: ClockRecoveryConfig, n_out):
    """NCO loop for one mode: lax.while_loop over output samples."""
    n_in = col.shape[0]

    def cond(state):
        n, m, _, _, _, _ = state
        return (n < n_out - 1) & (m < n_in - 2)

    def body(state):
        n, m, int_part, t_nco, eo, t_vals = state
        seg = jax.lax.dynamic_slice_in_dim(col, m - 2, 4)
        val = interpolator(seg, t_nco)
        eo = eo.at[n].set(val)

        def run_ted(args):
            int_part, t_nco, eo = args
            seg3 = jax.lax.dynamic_slice_in_dim(eo, n - 2, 3)
            if cfg.isNyquist:
                ted = gardner_ted_nyquist(seg3)
            else:
                ted = gardner_ted(seg3)
            int_part = cfg.ki * ted + int_part
            t_nco = t_nco - (cfg.kp * ted + int_part)
            return int_part, t_nco

        int_part, t_nco = jax.lax.cond(
            n % 2 == 0,
            run_ted,
            lambda args: (args[0], args[1]),
            (int_part, t_nco, eo),
        )

        # NCO clock gap: skip/stuff samples (clockRecovery.py:160-171)
        over = t_nco > 1
        under = t_nco < -1
        t_nco = jnp.where(over, t_nco - 1, jnp.where(under, t_nco + 1, t_nco))
        dn = jnp.where(over, -1, jnp.where(under, 2, 1))
        dm = jnp.where(over, 0, 1)
        n = n + dn
        m = m + dm
        t_vals = t_vals.at[jnp.clip(n, 0, n_out - 1)].set(t_nco)
        return n, m, int_part, t_nco, eo, t_vals

    eo0 = jnp.zeros(n_out, dtype=jnp.complex64)
    tv0 = jnp.zeros(n_out, dtype=jnp.float32)
    n, m, _, _, eo, t_vals = jax.lax.while_loop(
        cond, body, (2, 2, 0.0, 0.0, eo0, tv0)
    )
    return eo, t_vals, n


def gardner_clock_recovery(sig, config: ClockRecoveryConfig = ClockRecoveryConfig(),
                           return_timing=False, backend="scan",
                           static_out=False):
    """Gardner clock recovery with PI loop filter and NCO (clockRecovery.py:85).

    Input is expected at 2 samples/symbol; output is retimed at 2
    samples/symbol. Returns the recovered signal (and the NCO timing values if
    ``return_timing``).

    ``backend='pallas'`` runs the same recurrence in a fused TPU kernel
    (kernels/gardner_pallas.py, ~12x the while_loop on v5e; identical output
    to f32 rounding; interpret mode is selected automatically on CPU).

    ``static_out=True`` keeps the output length STATIC at
    ``n_out = (1 - maxPPM/1e6) * n_in`` instead of truncating to the
    realized sample count (which forces a host sync and makes the function
    untraceable under an outer ``jit``). Use it to compose clock recovery
    into one-jit chains: for any true offset ``|ppm| < maxPPM - margin``
    the NCO produces ~``(1 - ppm/1e6) * n_in > n_out`` samples, so the
    fixed-length output is fully valid; only if the input runs dry early
    is the tail zero-filled.
    """
    if backend == "pallas":
        from opticommpy_tpu.kernels.gardner_pallas import gardner_pallas

        return gardner_pallas(sig, config, return_timing=return_timing,
                              interpret=jax.default_backend() == "cpu",
                              static_out=static_out)
    sig = jnp.asarray(sig)
    squeeze = sig.ndim == 1
    if squeeze:
        sig = sig[:, None]
    sig = jnp.pad(sig, ((0, config.lpad), (0, 0)))
    n_in = sig.shape[0]
    n_out = int((1 - config.maxPPM / 1e6) * n_in)

    outs, t_vals, n_fin = [], [], []
    for k in range(sig.shape[1]):
        eo, tv, n = _gardner_one_mode(sig[:, k], config, n_out)
        outs.append(eo)
        t_vals.append(tv)
        n_fin.append(n)
    eo = jnp.stack(outs, axis=1)
    tv = jnp.stack(t_vals, axis=1)
    if not static_out:
        last_n = max(int(n) for n in n_fin)  # host sync: data-dependent crop
        eo, tv = eo[:last_n], tv[:last_n]
    if squeeze:
        eo = eo[:, 0]
        tv = tv[:, 0]
    return (eo, tv) if return_timing else eo


def calc_clock_drift(t_nco_values):
    """Clock drift estimate in ppm from NCO timing values (clockRecovery.py:194).

    Host-side analysis (find_peaks on the wrap events of the timing error).
    """
    t = np.asarray(t_nco_values)
    if t.ndim == 1:
        t = t[:, None]
    timing_err = t - np.mean(t, axis=0, keepdims=True)
    ppm = np.zeros(t.shape[1])
    for k in range(t.shape[1]):
        peaks, _ = find_peaks(np.abs(np.diff(timing_err[:, k])), height=0.5)
        if len(peaks) < 2:
            ppm[k] = 0.0
            continue
        mean_period = np.mean(np.diff(peaks))
        ppm[k] = np.sign(np.mean(t[:, k])) * (1 / mean_period) * 1e6
    return ppm
