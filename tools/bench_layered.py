"""Layered (serial-C) vs flooding megakernel decode at serving SNR (round 5).

The layered schedule updates the resident totals in place as check
columns are processed, so it converges in fewer sweeps (round-3 numpy
study: 1.76-1.83x for full-serial); with the per-chunk early-exit skip
those sweeps become wall time. This probe decodes REAL encoded DVB-S2
R4/5 codewords over BPSK/AWGN and reports, per (Es/N0, B): throughput,
iteration statistics and FER for mega+skip under both schedules.

Run: timeout 3000 python -u tools/bench_layered.py 2>&1 | \
     grep --line-buffered -v "Platform 'axon'"
"""

import json
import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticommpy_tpu.comm import fec_qc  # noqa: E402
from opticommpy_tpu.comm.fec import standard_ldpc  # noqa: E402
from tools.bench_early_exit import make_llrs, timed_decode  # noqa: E402

N, R = 64800, "4/5"


def main():
    _, edges = standard_ldpc("DVBS2", N, R)
    rng = np.random.default_rng(11)
    decs = {
        "flood_ee": fec_qc.make_qc_decoder(N, R, 20, "NMSA", "bf16",
                                           early_exit=True, backend="mega"),
        "layer_ee": fec_qc.make_qc_decoder(N, R, 20, "NMSA", "bf16",
                                           early_exit=True, backend="mega",
                                           schedule="layered"),
    }
    for B in (512,):
        for snr in (2.1, 2.3, 2.7):
            llrs, cw = make_llrs(snr, B, rng, edges)
            row = {"B": B, "esn0_db": snr}
            for name, dec in decs.items():
                dt, iters, fail, out = timed_decode(dec, llrs)
                bits = (out < 0).astype(np.int8)
                row[f"{name}_Mbit_per_s"] = round(N * B / dt / 1e6, 1)
                row[f"{name}_iters_mean"] = round(float(iters.mean()), 2)
                row[f"{name}_iters_max"] = int(iters.max())
                row[f"{name}_fer"] = float((bits != cw).any(axis=0).mean())
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
