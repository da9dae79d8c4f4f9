"""Multi-channel receiver at scale: batched training + fused serving.

A WDM receiver serves many channels concurrently. This example runs B
independent 16-QAM polmux links end to end (Tx -> nonlinear fiber -> PDM
coherent front end) and then recovers ALL of them with the two batch paths:

1. **training** (`pipelines.coherent_dsp_chain_batch`): the LTI front end is
   vmapped per channel, every channel's adaptive-equalizer recurrence runs
   in ONE Pallas kernel pass, and carrier recovery is one lane-packed BPS
   call — 4.4 Msym/s aggregate for 8 channels on one v5e. (With
   ``eqBackend='pallas'`` the equalizer instead runs each channel's FULL
   multi-stage training schedule on the batched kernels,
   ``dsp.mimo_adapt_equalizer_batch`` — 5.5 Msym/s aggregate at B=8.)
2. **serving** (`pipelines.coherent_dsp_serve`): once taps have converged,
   the matched filter + CD compensation + normalization + MIMO apply
   collapse into one decimating frequency-domain filter per channel —
   20-26 Msym/s at batch 8-32.

Runs on CPU by default (small sizes, Pallas interpret mode); on a TPU the
same code compiles to on-chip kernels.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true", help="run on CPU")
parser.add_argument("--channels", type=int, default=4)
parser.add_argument("--eq", default="batch-lms",
                    choices=("batch-lms", "pallas"),
                    help="equalizer path: single-stage batched LMS kernel "
                         "(default), or the full multi-stage training "
                         "schedule on the batched kernels ('pallas')")
args = parser.parse_args()
if args.cpu:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from opticommpy_tpu.comm.metrics import fast_ber_calc  # noqa: E402
from opticommpy_tpu.dsp import EDCConfig, edc  # noqa: E402
from opticommpy_tpu.models import (  # noqa: E402
    LaserConfig,
    PDMFrontendConfig,
    SSFMConfig,
    basic_laser_model,
    manakov_ssf,
    pdm_coherent_receiver,
)
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx  # noqa: E402
from opticommpy_tpu.ops import (  # noqa: E402
    decimate,
    fir_filter,
    pnorm,
    pulse_shape,
    symbol_sync,
)
from opticommpy_tpu.pipelines import (  # noqa: E402
    CoherentDSPConfig,
    coherent_dsp_chain_batch,
)


# All complex math stays INSIDE jit with float32 real/imag boundaries: on
# the axon TPU backend, eagerly-produced complex arrays (and complex host
# transfers) fail at first read.


@jax.jit
def simulate_link(key):
    """One 50 km 16-QAM polmux link: Tx -> Manakov fiber -> PDM receiver."""
    k_tx, k_ch, k_lo, k_rx = jax.random.split(key, 4)
    cfg_tx = WDMTxConfig(M=16, Rs=32e9, SpS=8, nBits=2**15, nChannels=1,
                         nPolModes=2, nFilterTaps=512, pulseRollOff=0.01,
                         powerPerChannel=(0.0,), laserLinewidth=50e3)
    fs = cfg_tx.Fs
    sig_tx, symb_tx, _ = simple_wdm_tx(k_tx, cfg_tx)
    cfg_ch = SSFMConfig(Ltotal=50, Lspan=50, alpha=0.2, D=16, gamma=1.3,
                        Fs=fs, amp="edfa", nlprMethod=False, hz=1.0)
    sig_ch = manakov_ssf(sig_tx, cfg_ch, k_ch)
    lo = basic_laser_model(
        LaserConfig(P=10.0, lw=50e3, Ns=sig_ch.shape[0], Fs=fs,
                    freqShift=50e6, RIN_var=0.0), k_lo)
    sig_rx = pdm_coherent_receiver(sig_ch, lo, PDMFrontendConfig(Fs=fs),
                                   key=k_rx)
    # synchronize the symbol reference once (training needs aligned symbols)
    pulse = jnp.asarray(pulse_shape("rrc", cfg_tx.SpS, 512, 0.01))
    pre = decimate(fir_filter(pulse, sig_rx), cfg_tx.SpS, 2)
    pre = edc(pre, EDCConfig(L=50, D=16, Fs=2 * 32e9, Rs=32e9))
    d_ref = pnorm(symbol_sync(pre, symb_tx[:, :, 0], 2))
    to_ri = lambda z: jnp.stack([z.real, z.imag], axis=-1).astype(jnp.float32)
    return to_ri(sig_rx), to_ri(d_ref)


def main():
    b = args.channels
    disc = 4000  # training + convergence region
    cfg = CoherentDSPConfig(SpS_in=8, nFilterTaps=512, L=50, nTrain=3000,
                            mu=(2e-3,) if args.eq == "batch-lms"
                            else (5e-3, 2e-3),
                            eqBackend="pallas" if args.eq == "pallas"
                            else "scan")

    @jax.jit
    def receive_all(sig_b_ri, ref_b_ri):
        sig_b = (sig_b_ri[..., 0] + 1j * sig_b_ri[..., 1]).astype(jnp.complex64)
        ref_b = (ref_b_ri[..., 0] + 1j * ref_b_ri[..., 1]).astype(jnp.complex64)
        y_b, _ = coherent_dsp_chain_batch(sig_b, ref_b, cfg)
        bers, snrs = [], []
        for i in range(b):  # unrolled: tiny per-channel metric reductions
            ber, _, snr = fast_ber_calc(y_b[i, disc:-100],
                                        ref_b[i][disc:-100], 16, "qam")
            bers.append(ber)
            snrs.append(jnp.mean(snr))
        return jnp.stack(bers), jnp.stack(snrs)

    print(f"simulating {b} independent 50 km 16-QAM polmux links...")
    links = [simulate_link(jax.random.PRNGKey(100 + i)) for i in range(b)]
    sig_b_ri = jnp.stack([s for s, _ in links])
    ref_b_ri = jnp.stack([r for _, r in links])

    print(f"training {b} receivers in one batched program...")
    bers, snrs = receive_all(sig_b_ri, ref_b_ri)
    bers = np.asarray(bers)
    snrs = np.asarray(snrs)

    print(f"\n{'channel':>8s} {'BER (x)':>10s} {'BER (y)':>10s} {'SNR':>7s}")
    for i in range(b):
        print(f"{i:8d} {bers[i, 0]:10.2e} {bers[i, 1]:10.2e} "
              f"{snrs[i]:6.2f} dB")
        assert float(np.max(bers[i])) < 1e-2

    print("\nall channels recovered; for the converged/serving path see "
          "pipelines.coherent_dsp_serve (20-26 Msym/s at batch 8-32 on v5e)")


if __name__ == "__main__":
    main()
