"""Fit compact Gaussian-band models to the reference EDF Giles spectra.

The reference ships measured erbium-fiber parameter files
(`/root/reference/optic/models/ampParams/giles_MP980.dat` — absorption and
gain coefficients [dB/m] vs wavelength, consumed by edfaSM at
amplification.py:289 — and `EDF.dat`, pump-band cross-sections [m^2]).
Rather than redistributing the measured asset, this script fits each curve
as a sum of Gaussian bands (the standard physical decomposition of Er3+
absorption/emission spectra — Stark-split manifolds produce near-Gaussian
sub-bands) and emits the coefficients to
``opticommpy_tpu/models/_edf_mp980.py``. The generated module reproduces the
curves to ~1-2% of peak, enough for quantitative gain/NF simulation of an
MP980-class fiber.

Run (requires the reference mount): python tools/fit_edf_gaussians.py
"""

import os
import sys

import numpy as np
from scipy.optimize import least_squares

REF = "/root/reference/optic/models/ampParams"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "opticommpy_tpu", "models", "_edf_mp980.py")


def gauss_sum(lb, params):
    """params: (K, 3) rows of (amplitude, center_nm, sigma_nm)."""
    out = np.zeros_like(lb, dtype=float)
    for a, c, s in params:
        out += a * np.exp(-0.5 * ((lb - c) / s) ** 2)
    return out


def fit_curve(lb, y, n_bands, seed_centers=None, label=""):
    peak = np.max(np.abs(y))
    # seed: spread centers over the support of |y| > 2% peak
    sup = lb[np.abs(y) > 0.02 * peak]
    if seed_centers is None:
        seed_centers = np.linspace(sup.min(), sup.max(), n_bands)
    p0 = []
    for c in seed_centers:
        i = np.argmin(np.abs(lb - c))
        p0 += [y[i], c, (sup.max() - sup.min()) / n_bands]
    p0 = np.array(p0)

    def resid(p):
        return gauss_sum(lb, p.reshape(-1, 3)) - y

    lo = np.tile([-np.inf, lb.min(), 0.3], n_bands)
    hi = np.tile([np.inf, lb.max(), 400.0], n_bands)
    sol = least_squares(resid, p0, bounds=(lo, hi), max_nfev=20000)
    params = sol.x.reshape(-1, 3)
    err = np.max(np.abs(resid(sol.x))) / peak
    rms = np.sqrt(np.mean(resid(sol.x) ** 2)) / peak
    print(f"{label}: {n_bands} bands, max err {err*100:.2f}% of peak, "
          f"rms {rms*100:.3f}%")
    return params, err


def main():
    mp = np.loadtxt(os.path.join(REF, "giles_MP980.dat"))
    lb, absc, gain = mp[:, 0], mp[:, 1], mp[:, 2]

    best = {}
    for name, y, n in [("absorption", absc, 16), ("gain", gain, 12)]:
        params, err = fit_curve(lb, y, n, label=f"MP980 {name}")
        k = 1
        while err > 0.015 and k <= 3:  # tighten until ~1.5% of peak
            params, err = fit_curve(lb, y, n + 4 * k,
                                    label=f"MP980 {name} (retry {k})")
            k += 1
        best[name] = params

    edf = np.loadtxt(os.path.join(REF, "EDF.dat"))
    elb, eabs, eemi = edf[:, 0], edf[:, 1], edf[:, 2]
    scale = 1e25  # fit in 1e-25 m^2 units for conditioning
    eabs_p, _ = fit_curve(elb, eabs * scale, 6, label="EDF.dat abs xsec")
    eemi_p, _ = (fit_curve(elb, eemi * scale, 6, label="EDF.dat emi xsec")
                 if np.any(eemi) else (np.zeros((0, 3)), 0.0))

    def fmt(params):
        rows = ",\n    ".join(
            f"({a:.6e}, {c:.4f}, {s:.4f})" for a, c, s in params)
        return f"(\n    {rows},\n)"

    with open(OUT, "w") as f:
        f.write('"""MP980-class EDF Giles parameters (generated — do not '
                'edit).\n\nGaussian-band decompositions fitted by\n'
                "tools/fit_edf_gaussians.py to MP980 erbium-fiber Giles\n"
                "spectra: rows of (amplitude, center_nm, sigma_nm);\n"
                "absorption/gain in dB/m over 875-1650 nm, EDF pump-band\n"
                "cross-sections in 1e-25 m^2 over "
                f"{elb.min():.0f}-{elb.max():.0f} nm.\n"
                '"""\n\n')
        f.write(f"LAMBDA_NM = ({lb.min()}, {lb.max()})\n\n")
        f.write(f"ABSORPTION_DB_M = {fmt(best['absorption'])}\n\n")
        f.write(f"GAIN_DB_M = {fmt(best['gain'])}\n\n")
        f.write(f"XSEC_LAMBDA_NM = ({elb.min()}, {elb.max()})\n\n")
        f.write(f"XSEC_ABS_1E25_M2 = {fmt(eabs_p)}\n\n")
        f.write(f"XSEC_EMI_1E25_M2 = {fmt(eemi_p)}\n")
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
