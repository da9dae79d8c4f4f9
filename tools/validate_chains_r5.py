"""Real-TPU validation of the round-5 composed chains (VERDICT r4 items 3, 9).

1. 4x4 mode-multiplexed adaptive chain: the one-jit coherent_dsp_chain at
   n_modes=4 on the Pallas equalizer backend (the kernels are NxN-general
   and 4x4-tested in isolation; this is the first composed >2-mode run on
   hardware). Mirrors tests/test_pipelines.py::test_coherent_pipeline_4x4_modes.
2. Clock-recovered chain: +200 ppm ADC clock offset + jitter on a real
   50 km 16QAM polmux link, absorbed by the Gardner stage (runCR=True,
   crBackend='pallas') inside the SAME one-jit chain; the no-CR control
   collapses. Mirrors ...::test_coherent_pipeline_with_clock_recovery.

Link synthesis runs in a CPU-platform subprocess (the bench process owns
the single TPU tenant); the TPU process loads f32 arrays and runs ONE jit
per chain returning scalars (axon-tunnel rules).

Usage: timeout 3000 python -u tools/validate_chains_r5.py [--cpu] 2>&1 | \
       grep --line-buffered -v "Platform 'axon'"
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.expanduser("~"), ".cache", "opticommpy_tpu",
                     "validate_chains_r5.npz")

_SYNTH = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from opticommpy_tpu.models import (LaserConfig, PDMFrontendConfig, SSFMConfig,
                                   basic_laser_model, manakov_ssf,
                                   pdm_coherent_receiver)
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx
from opticommpy_tpu.ops import decimate, fir_filter, pnorm, pulse_shape, symbol_sync
from opticommpy_tpu.dsp import EDCConfig, edc
from opticommpy_tpu.ops.signal import clock_sampling_interp
from opticommpy_tpu.comm.modulation import gray_mapping
from opticommpy_tpu.ops import upsample

# --- CR link: the test_coherent_pipeline_with_clock_recovery workload ---
key = jax.random.PRNGKey(35)
k_tx, k_ch, k_lo, k_rx, k_j = jax.random.split(key, 5)
cfg_tx = WDMTxConfig(M=16, Rs=32e9, SpS=8, nBits=2**15, nChannels=1,
                     nPolModes=2, nFilterTaps=512, pulseRollOff=0.01,
                     powerPerChannel=(0.0,), laserLinewidth=50e3)
fs = cfg_tx.Fs
sig_tx, symb_tx, _ = simple_wdm_tx(k_tx, cfg_tx)
cfg_ch = SSFMConfig(Ltotal=50, Lspan=50, alpha=0.2, D=16, gamma=1.3, Fs=fs,
                    amp="edfa", nlprMethod=False, hz=1.0)
sig_ch = manakov_ssf(sig_tx, cfg_ch, k_ch)
lo = basic_laser_model(LaserConfig(P=10.0, lw=50e3, Ns=sig_ch.shape[0],
                                   Fs=fs, freqShift=50e6, RIN_var=0.0), k_lo)
sig_rx = pdm_coherent_receiver(sig_ch, lo, PDMFrontendConfig(Fs=fs), key=k_rx)
pulse = jnp.asarray(pulse_shape("rrc", 8, 512, 0.01))
pre = decimate(fir_filter(pulse, sig_rx), 8, 2)
pre = edc(pre, EDCConfig(L=50, D=16, Fs=2 * 32e9, Rs=32e9))
d_ref = pnorm(symbol_sync(pre, symb_tx[:, :, 0], 2))
sig_off = clock_sampling_interp(sig_rx, fs, fs * (1 + 200e-6),
                                jitter_rms=1e-3 / fs, key=k_j)

# --- 4x4 link: the test_coherent_pipeline_4x4_modes workload ---
rng = np.random.default_rng(77)
n_sym, sps, modes = 2**14, 2, 4
const = gray_mapping(16, "qam")
const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)
sym4 = const[rng.integers(0, 16, size=(n_sym, modes))]
p4 = jnp.asarray(pulse_shape("rrc", sps, 257, 0.1))
wav = fir_filter(p4, upsample(jnp.asarray(sym4), sps))
mix = (np.eye(modes) + 0.12 * (rng.normal(size=(modes, modes))
                               + 1j * rng.normal(size=(modes, modes)))
       ).astype(np.complex64)
sig4 = (np.asarray(wav) @ mix.T
        + 0.015 * (rng.normal(size=wav.shape)
                   + 1j * rng.normal(size=wav.shape))).astype(np.complex64)

def ri(z):
    z = np.asarray(z)
    return np.stack([z.real, z.imag], -1).astype(np.float32)

np.savez({cache!r}, sig_off=ri(sig_off), d_cr=ri(np.asarray(d_ref)[:8000]),
         sig4=ri(sig4), ref4=ri(sym4))
"""


def synth():
    if not os.path.exists(CACHE):
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = _SYNTH.format(repo=repo, cache=CACHE)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", script], check=True, env=env)
    return np.load(CACHE)


def main():
    from opticommpy_tpu.comm.metrics import fast_ber_calc
    from opticommpy_tpu.pipelines import CoherentDSPConfig, coherent_dsp_chain

    data = synth()
    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- 4x4 chain (Pallas equalizer + Pallas BPS) ----
    cfg4 = CoherentDSPConfig(
        SpS_in=2, SpS_dsp=2, nFilterTaps=257, rollOff=0.1, L=0.5,
        nTaps=15, mu=(5e-3, 1e-3), nTrain=6000, runFOE=False,
        eqBackend="pallas", cprBackend="pallas")

    @jax.jit
    def run4(s_ri, r_ri):
        s = (s_ri[..., 0] + 1j * s_ri[..., 1]).astype(jnp.complex64)
        r = (r_ri[..., 0] + 1j * r_ri[..., 1]).astype(jnp.complex64)
        y, _ = coherent_dsp_chain(s, r, cfg4)
        ber, _, snr = fast_ber_calc(y[8000:-100], r[8000:-100], 16, "qam")
        return jnp.max(ber), jnp.min(snr)

    s4 = jnp.asarray(data["sig4"])
    r4 = jnp.asarray(data["ref4"])
    b, s = (float(v) for v in run4(s4, r4))
    t0 = time.perf_counter()
    b, s = (float(v) for v in run4(s4, r4))
    dt4 = time.perf_counter() - t0
    n4 = data["ref4"].shape[0]
    print(f"RESULT 4x4 max_ber={b:.3e} min_snr={s:.2f}dB "
          f"t={dt4 * 1e3:.1f}ms ({n4 / dt4 / 1e6:.3f} Msym/s x4 modes)",
          flush=True)

    # ---- clock-recovered chain vs no-CR control ----
    cr_backend = "pallas" if jax.default_backend() != "cpu" else "scan"
    cfg_cr = CoherentDSPConfig(SpS_in=8, nFilterTaps=512, L=50, nTrain=4000,
                               runCR=True, crBackend=cr_backend,
                               crNyquist=True, crKp=2e-3, crKi=1e-5)
    cfg_no = CoherentDSPConfig(SpS_in=8, nFilterTaps=512, L=50, nTrain=4000)

    def chain(cfg):
        @jax.jit
        def run(s_ri, r_ri):
            sg = (s_ri[..., 0] + 1j * s_ri[..., 1]).astype(jnp.complex64)
            r = (r_ri[..., 0] + 1j * r_ri[..., 1]).astype(jnp.complex64)
            y, _ = coherent_dsp_chain(sg, r, cfg)
            ber, _, snr = fast_ber_calc(y[5000:-100], r[5000:-100], 16,
                                        "qam")
            return jnp.max(ber), jnp.min(snr)

        return run

    so = jnp.asarray(data["sig_off"])
    dc = jnp.asarray(data["d_cr"])
    run_cr = chain(cfg_cr)
    b_cr, s_cr = (float(v) for v in run_cr(so, dc))  # compile
    t0 = time.perf_counter()
    b_cr, s_cr = (float(v) for v in run_cr(so, dc))
    dt = time.perf_counter() - t0
    n_cr = data["d_cr"].shape[0]
    print(f"RESULT cr_chain max_ber={b_cr:.3e} min_snr={s_cr:.2f}dB "
          f"t={dt * 1e3:.1f}ms ({n_cr / dt / 1e6:.3f} Msym/s "
          "incl. training)", flush=True)
    b_no, s_no = (float(v) for v in chain(cfg_no)(so, dc))
    print(f"RESULT nocr_control max_ber={b_no:.3e} min_snr={s_no:.2f}dB",
          flush=True)
    assert b_cr < 1e-2 < b_no, (b_cr, b_no)
    print("OK: clock recovery absorbs the 200 ppm offset; control fails")


if __name__ == "__main__":
    main()
