"""Real-TPU validation of the non-coherent chains (OOK, IM-DD PAM+FFE/DFE, OFDM).

The reference workloads these mirror: basic_OOK_transmission.ipynb,
test_equalizers_for_IMDD_transmission.ipynb, test_ofdm.ipynb. The example
scripts run these chains in CI on the CPU mesh; this script runs each chain
as ONE jitted function returning f32 scalars (the axon-tunnel rules: one jit
per chain, no complex or large-array host transfers, scalar-reduce outputs)
so the same code validates on the real TPU.

Usage:
    python tools/validate_noncoherent.py [--cpu]

Prints one `RESULT <chain> <metric>=<value> ...` line per chain; run with
and without --cpu and diff the numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.comm import bit_source, modulate_gray
from opticommpy_tpu.comm.metrics import bert, calc_evm, fast_ber_calc
from opticommpy_tpu.comm.ofdm import OFDMConfig, demodulate_ofdm, modulate_ofdm
from opticommpy_tpu.dsp import DFEConfig, FFEConfig, dfe, ffe
from opticommpy_tpu.models import (
    AWGNConfig,
    EDFAConfig,
    LinearFiberConfig,
    MZMConfig,
    PhotodiodeConfig,
    awgn,
    edfa,
    linear_fiber_channel,
    mzm,
    photodiode,
)
from opticommpy_tpu.models.tx import PAMTxConfig, pam_transmitter
from opticommpy_tpu.ops import fir_filter, pnorm, pulse_shape, upsample
from opticommpy_tpu.utils import dbm2w


# ---------------------------------------------------------------- OOK chain
SPS, RS = 16, 10e9
FS = RS * SPS
N_BITS = 100_000
PULSE_NP = np.asarray(pulse_shape("nrz", SPS), dtype=np.float32)


def ook_link(key, prx_dbm):
    """10G OOK IM-DD link at received power prx_dbm -> (BER, Q).

    Mirrors examples/basic_ook_transmission.py (reference
    basic_OOK_transmission.ipynb): NRZ pulse -> MZM -> 100 m fiber ->
    EDFA -> pin PD -> optimal-threshold BER.
    """
    kb, ke, kp = jax.random.split(key, 3)
    pulse = jnp.asarray(PULSE_NP)
    bits = bit_source(kb, N_BITS)
    symb = modulate_gray(bits, 2, "ook").real.astype(jnp.float32)
    sig = fir_filter(pulse, upsample(symb, SPS))
    txo = mzm(jnp.ones_like(sig) + 0j, 0.25 * 2 * (2 * sig - 1),
              MZMConfig(Vpi=2.0, Vb=-1.0, ER=60))
    txo = txo * jnp.sqrt(dbm2w(prx_dbm) / jnp.mean(jnp.abs(txo) ** 2))
    rx = linear_fiber_channel(
        txo, LinearFiberConfig(L=0.1, alpha=0.0, D=17, Fs=FS))
    rx = edfa(rx, EDFAConfig(G=20.0, NF=4.5, Fs=FS), ke)
    irx = photodiode(rx, PhotodiodeConfig(Fs=FS, B=10e9), kp)
    i_sym = (irx / jnp.mean(irx) / 2)[0::SPS][8:-8][: N_BITS - 16]
    ber, q = bert(i_sym, bits[8:-8][: N_BITS - 16])
    return ber.astype(jnp.float32), q.astype(jnp.float32)


# --------------------------------------------------- IM-DD PAM + FFE / DFE
PAM_CFG = PAMTxConfig(M=4, Rs=25e9, SpS=8, nBits=2**16, pulseType="nrz",
                      power=3.0)
N_TRAIN = 8000


def pam_link(key):
    """PAM4 IM-DD 10 km dispersive link -> FFE and DFE tail MSE + BER.

    Mirrors examples/imdd_pam_equalization.py (reference
    test_equalizers_for_IMDD_transmission.ipynb).
    Returns (mse_ffe, ber_ffe, mse_dfe, ber_dfe) f32 scalars.
    """
    k_tx, k_pd = jax.random.split(key)
    fs = PAM_CFG.Fs
    sig, symb = pam_transmitter(k_tx, PAM_CFG)
    rx = linear_fiber_channel(
        sig, LinearFiberConfig(L=10, alpha=0.2, D=17, Fs=fs))
    i_rx = photodiode(rx, PhotodiodeConfig(Fs=fs, B=20e9), k_pd)
    samples = pnorm(
        i_rx[0 :: PAM_CFG.SpS][: PAM_CFG.nSymbols] - jnp.mean(i_rx))
    ref = pnorm(symb)

    y_ffe, _, mse_ffe = ffe(
        samples, ref, FFEConfig(nTaps=15, mu=2e-3, nTrain=N_TRAIN, M=4,
                                constType="pam", trainingMode="fulltime"))
    y_dfe, _, _, mse_dfe = dfe(
        samples, ref, DFEConfig(nTapsFF=15, nTapsFB=5, mu=2e-3,
                                nTrain=N_TRAIN, M=4, constType="pam",
                                trainingMode="fulltime"))
    tail = slice(-20000, None)
    post = slice(2 * N_TRAIN, None)
    ber_f, _, _ = fast_ber_calc(y_ffe[post].real, ref[post].real, 4, "pam")
    ber_d, _, _ = fast_ber_calc(y_dfe[post].real, ref[post].real, 4, "pam")
    return (jnp.mean(mse_ffe[tail]).astype(jnp.float32),
            ber_f[0].astype(jnp.float32),
            jnp.mean(mse_dfe[tail]).astype(jnp.float32),
            ber_d[0].astype(jnp.float32))


# ------------------------------------------------------------------- OFDM
NFFT, CP = 256, 32
PILOTS = tuple(range(0, NFFT, 16))
OFDM_CFG = OFDMConfig(Nfft=NFFT, G=CP, SpS=1, pilotCarriers=PILOTS)
N_FRAMES = 100
OFDM_M = 16


def ofdm_link(key):
    """16QAM-OFDM over 40 km CD + AWGN with pilot equalization.

    Mirrors examples/ofdm_transmission.py (reference test_ofdm.ipynb).
    Returns (BER, SNR_dB, EVM) f32 scalars.
    """
    kb, kn = jax.random.split(key)
    ni = NFFT - len(PILOTS)
    bits = bit_source(kb, ni * N_FRAMES * 4)
    symb = pnorm(modulate_gray(bits, OFDM_M, "qam"))
    sig = modulate_ofdm(symb, OFDM_CFG)
    fs = 10e9
    rx = linear_fiber_channel(
        sig, LinearFiberConfig(L=40, alpha=0.0, D=17, Fs=fs))
    rx = awgn(rx, kn, AWGNConfig(snr=25.0))
    rec = demodulate_ofdm(rx, OFDM_CFG)
    ber, _, snr = fast_ber_calc(rec, symb, OFDM_M, "qam")
    evm = calc_evm(rec, OFDM_M, "qam", symb_tx=symb)
    return (ber[0].astype(jnp.float32), snr[0].astype(jnp.float32),
            evm[0].astype(jnp.float32))


def _timed(fn, *args):
    t0 = time.perf_counter()
    out = [float(x) for x in fn(*args)]  # scalar transfers force execution
    return out, time.perf_counter() - t0


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")

    ook = jax.jit(ook_link)
    for i, p in enumerate((-30.0, -25.0)):
        (ber, q), dt = _timed(ook, jax.random.PRNGKey(i), p)
        (ber, q), dt = _timed(ook, jax.random.PRNGKey(i), p)  # warm
        print(f"RESULT ook prx={p:.0f}dBm ber={ber:.3e} q={q:.3f} "
              f"t={dt * 1e3:.1f}ms")

    pam = jax.jit(pam_link)
    out, dt = _timed(pam, jax.random.PRNGKey(3))
    out, dt = _timed(pam, jax.random.PRNGKey(3))
    print(f"RESULT pam mse_ffe={out[0]:.4f} ber_ffe={out[1]:.3e} "
          f"mse_dfe={out[2]:.4f} ber_dfe={out[3]:.3e} t={dt * 1e3:.1f}ms")

    ofdm = jax.jit(ofdm_link)
    out, dt = _timed(ofdm, jax.random.PRNGKey(9))
    out, dt = _timed(ofdm, jax.random.PRNGKey(9))
    print(f"RESULT ofdm ber={out[0]:.3e} snr={out[1]:.2f}dB "
          f"evm={100 * out[2]:.2f}% t={dt * 1e3:.1f}ms")


if __name__ == "__main__":
    main()
