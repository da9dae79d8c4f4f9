"""Per-stage DSP timing table (reference 'DSP execution time benchmark' cell).

Builds a coherent 16-QAM polmux signal, runs each receiver stage with the
StageTimer (device-synchronized), and prints the timing table.

Usage: python examples/dsp_stage_timings.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from opticommpy_tpu.dsp import CPRConfig, EDCConfig, MIMOEqualizerConfig, cpr, edc, mimo_adapt_equalizer
from opticommpy_tpu.models import SSFMConfig, manakov_ssf
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx
from opticommpy_tpu.ops import decimate, fir_filter, pnorm, pulse_shape, symbol_sync
from opticommpy_tpu.utils.profiling import StageTimer


def main():
    key = jax.random.PRNGKey(0)
    k_tx, k_ch = jax.random.split(key)
    cfg_tx = WDMTxConfig(M=16, Rs=32e9, SpS=8, nBits=2**16, nChannels=1,
                         nPolModes=2, nFilterTaps=512, powerPerChannel=(0.0,))
    fs = cfg_tx.Fs
    sig_tx, symb_tx, _ = simple_wdm_tx(k_tx, cfg_tx)
    sig_ch = manakov_ssf(
        sig_tx, SSFMConfig(Ltotal=100, Lspan=50, Fs=fs, amp="edfa"), k_ch
    )

    timer = StageTimer()
    pulse = jnp.asarray(pulse_shape("rrc", cfg_tx.SpS, 512, 0.01))

    with timer("matched filter"):
        x = timer.sync(fir_filter(pulse, sig_ch))
    with timer("decimation (8->2 SpS)"):
        x = timer.sync(decimate(x, cfg_tx.SpS, 2))
    with timer("CD compensation"):
        x = timer.sync(edc(x, EDCConfig(L=100, D=16, Fs=2 * 32e9, Rs=32e9)))
    with timer("symbol sync"):
        d = timer.sync(pnorm(symbol_sync(x, symb_tx[:, :, 0], 2)))
    n_sym = d.shape[0]
    with timer("MIMO equalizer"):
        y = timer.sync(mimo_adapt_equalizer(
            pnorm(x),
            MIMOEqualizerConfig(nTaps=15, SpS=2, mu=(5e-3, 2e-3),
                                alg=("da-rde", "dd-lms"),
                                L=(6000, n_sym - 6000), M=16),
            symb_ref=d,
        ))
    with timer("carrier recovery (BPS)"):
        y = timer.sync(cpr(y, CPRConfig(alg="bps", M=16, N=75, B=64,
                                        Ts=1 / 32e9)))
    print(timer.table())


if __name__ == "__main__":
    main()
