"""Benchmark: Manakov SSFM throughput on the north-star WDM polmux workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json north-star): the REAL 11-channel 16-QAM polmux WDM
aggregate field from `simple_wdm_tx` (37.5 GHz grid, RRC 0.01, -2 dBm/ch),
2^20 samples (65536 symbols at SpS=16, Rs=32 GBd, Fs=512 GHz), 5 x 50 km
spans, hz=0.5 km fixed step (500 symmetric split steps). Matches the
reference's headline GPU benchmark workload
(examples/benchmarck_GPU_processing.ipynb) at 11-channel WDM scale.

- value: samples/s propagated through the full link on one chip (jitted,
  compile excluded, best of 3).
- vs_baseline: speedup against the reference algorithm's CPU formulation
  (vectorized NumPy transcription of manakovSSF, channels.py:252 — the
  reference's own Numba path is not installable here; NumPy's C FFT loop is
  the same algorithmic baseline it accelerates), measured on this host and
  linearly scaled from 20 steps.

Conventions for the axon TPU backend: single jit for the whole propagation;
float32 (real/imag stacked) at the host boundary (complex transfers are
Unimplemented); deterministic ('ideal') amplification in the timed loop.
"""

import json
import math
import os
import subprocess
import sys
import time

if "--cpu" in sys.argv:  # debug runs must never grab the single-tenant TPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("--cpu")

import numpy as np


N_SAMPLES = 2**20
N_SPANS = 5
L_SPAN = 50.0
HZ = 0.5
ALPHA_DB = 0.2
D_PS = 16.0
GAMMA = 1.3
RS = 32e9
SPS = 16  # 11 x 37.5 GHz grid needs Fs >= 412.5 GHz -> SpS 16 at 32 GBd
FS = RS * SPS
N_CHANNELS = 11
WDM_SEED = 0

_FIELD_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "opticommpy_tpu",
    f"bench_wdm_{N_CHANNELS}ch_16qam_{N_SAMPLES}.npy")

_FIELD_GEN = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {repo!r})
from opticommpy_tpu.models.tx import WDMTxConfig, simple_wdm_tx
cfg = WDMTxConfig(M=16, Rs={rs}, SpS={sps}, nChannels={nch}, nPolModes=2,
                  wdmGridSpacing=37.5e9, powerPerChannel=(-2.0,),
                  nBits={nbits}, nFilterTaps=1024, pulseRollOff=0.01)
sig, _, _ = simple_wdm_tx({seed}, cfg)
sig = np.asarray(sig)
assert sig.shape == ({nsamp}, 2), sig.shape
out = np.stack([sig.real, sig.imag], axis=-1).astype(np.float32)
np.save({cache!r}, out)
"""


def _field():
    """The north-star field: 11-channel 16-QAM polmux WDM (BASELINE.json).

    Generated once by `simple_wdm_tx` (RRC-shaped symbols on a 37.5 GHz
    grid, -2 dBm/channel — the test_WDM_transmission.ipynb workload shape)
    in a CPU-platform subprocess and cached: under the axon tunnel the
    bench process owns the single TPU tenant, so Tx synthesis must not
    race the timed propagation program.
    Returns float32 (nSamples, 2 pol, 2 re/im).
    """
    if not os.path.exists(_FIELD_CACHE):
        os.makedirs(os.path.dirname(_FIELD_CACHE), exist_ok=True)
        repo = os.path.dirname(os.path.abspath(__file__))
        n_bits = int(N_SAMPLES / SPS * np.log2(16))
        script = _FIELD_GEN.format(repo=repo, rs=RS, sps=SPS, nch=N_CHANNELS,
                                   nbits=n_bits, seed=WDM_SEED,
                                   nsamp=N_SAMPLES, cache=_FIELD_CACHE)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", script], check=True, env=env)
    return np.load(_FIELD_CACHE)


def run_tpu():
    import jax
    import jax.numpy as jnp
    from opticommpy_tpu.models import SSFMConfig
    from opticommpy_tpu.models.channels import manakov_ssf

    cfg = SSFMConfig(
        Ltotal=N_SPANS * L_SPAN, Lspan=L_SPAN, hz=HZ, alpha=ALPHA_DB, D=D_PS,
        gamma=GAMMA, Fs=FS, amp="ideal", nlprMethod=False, trapIters=1,
        fusedLinear=True, fftBackend="matmul",
    )

    @jax.jit
    def prop(field_ri):
        e = field_ri[..., 0] + 1j * field_ri[..., 1]
        out = manakov_ssf(e, cfg)
        # reduce on device: return a scalar so the transfer is trivial
        return jnp.mean((out * jnp.conj(out)).real)

    x = jnp.asarray(_field())
    # warm-up (compile)
    float(prop(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(prop(x))  # scalar transfer forces full execution
        times.append(time.perf_counter() - t0)
    return N_SAMPLES / min(times), sorted(N_SAMPLES / t for t in times)


def run_numpy_baseline(n_steps_measure=20):
    """Reference-formulation CPU SSFM (vectorized numpy, channels.py:252)."""
    c_kms = 299792458.0 / 1e3
    lam = c_kms / 193.1e12
    alpha = ALPHA_DB / (10 * np.log10(np.e))
    beta2 = -(D_PS * lam**2) / (2 * np.pi * c_kms)

    w = 2 * np.pi * FS * np.fft.fftfreq(N_SAMPLES)
    lin_op = np.exp((-(alpha / 2) + 1j * (beta2 / 2) * w**2) * (HZ / 2)).astype(
        np.complex64
    )
    f = _field()
    ex = (f[:, 0, 0] + 1j * f[:, 0, 1]).astype(np.complex64)
    ey = (f[:, 1, 0] + 1j * f[:, 1, 1]).astype(np.complex64)

    def measure():
        nonlocal ex, ey
        t0 = time.perf_counter()
        for _ in range(n_steps_measure):
            ex = np.fft.ifft(np.fft.fft(ex) * lin_op)
            ey = np.fft.ifft(np.fft.fft(ey) * lin_op)
            pch = np.abs(ex) ** 2 + np.abs(ey) ** 2
            rot = np.exp(1j * (8 / 9) * GAMMA * pch * HZ)
            ex *= rot
            ey *= rot
            ex = np.fft.ifft(np.fft.fft(ex) * lin_op)
            ey = np.fft.ifft(np.fft.fft(ey) * lin_op)
        return time.perf_counter() - t0

    dt = min(measure() for _ in range(3))  # best-of-3: contention-robust
    total_steps = int(N_SPANS * L_SPAN / HZ)
    return N_SAMPLES / (dt * total_steps / n_steps_measure)


def run_dsp_chain(batch=8):
    """Frozen-tap coherent DSP chain (MF+EDC+MIMO apply+BPS), Msym/s.

    The converged/serving path of the flagship receiver, amortized over a
    batch of `batch` polmux signals vmapped through one program (a WDM
    receiver serves many channels per dispatch; bench_dsp.py has the
    per-stage breakdown and single-signal/adaptive variants). Uses the
    fused front end (mimo_apply_fused: MF+EDC+pnorm+MIMO as one decimating
    frequency-domain filter — ~10% over the staged composition).
    """
    import jax
    import jax.numpy as jnp

    import bench_dsp

    out = bench_dsp.build_chain()  # index, don't unpack: the tuple grows
    fused_batch, sig, h0 = out[4], out[6], out[7]
    sig_b = jnp.broadcast_to(sig, (batch,) + sig.shape)
    h_b = jnp.broadcast_to(h0, (batch,) + h0.shape)

    run = jax.jit(fused_batch)

    float(run(sig_b, h_b))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(sig_b, h_b))
        times.append(time.perf_counter() - t0)
    return batch * bench_dsp.N_SYM / min(times) / 1e6


def run_cr_chain(batch=8):
    """Clock-recovered serving chain (feedforward CR), batch-8 Msym/s.

    Same serving workload as run_dsp_chain plus a per-signal clock
    recovery stage — the feedforward block-parallel method
    (dsp.clock_recovery.ffw_clock_recovery: spectral-line timing
    estimate + parallel cubic resampler, no recurrence). The Gardner-NCO
    version of this row lives in bench_dsp.py (~0.59 Msym/s on v5e: the
    sequential loop is the ceiling); the feedforward stage keeps the
    chain within ~10% of the CR-free serving rate.
    """
    import jax
    import jax.numpy as jnp

    import bench_dsp

    out = bench_dsp.build_chain()
    cr_ffw_b, sig, h0 = out[11], out[6], out[7]
    sig_b = jnp.broadcast_to(sig, (batch,) + sig.shape)
    h_b = jnp.broadcast_to(h0, (batch,) + h0.shape)
    run = jax.jit(cr_ffw_b)
    float(run(sig_b, h_b))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(sig_b, h_b))
        times.append(time.perf_counter() - t0)
    return batch * bench_dsp.N_SYM / min(times) / 1e6


def run_adaptive_train(n_sym=2**16):
    """One-jit adaptive receiver chain INCL. multi-stage training, Msym/s.

    MF + EDC + the full multi-stage adaptive equalizer (da-rde then
    dd-lms, numIter=2 pre-convergence passes, backend='pallas': every
    stage's per-symbol recurrence as a VMEM-resident kernel,
    dsp/equalization.py) + Pallas BPS — the TRAINING counterpart of
    run_dsp_chain's frozen serving path (reference training schedule
    shape: equalization.py:266-319).
    """
    import jax
    import jax.numpy as jnp

    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.equalization import (EDCConfig,
                                                 MIMOEqualizerConfig, edc,
                                                 mimo_adapt_equalizer)
    from opticommpy_tpu.kernels.bps_pallas import bps_pallas
    from opticommpy_tpu.ops.filtering import fir_filter, pulse_shape
    from opticommpy_tpu.ops.signal import pnorm

    sps, rs = 2, 32e9
    fs = rs * sps
    pulse = pulse_shape("rrc", sps, 512, 0.1).astype(np.float32)
    const = gray_mapping(16, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(
        np.complex64)
    edc_cfg = EDCConfig(L=400, D=16, Fs=fs, Rs=rs)
    n_train = min(8192, n_sym // 2)
    eq_cfg = MIMOEqualizerConfig(
        nTaps=15, SpS=sps, mu=(5e-3, 1e-3), alg=("da-rde", "dd-lms"),
        L=(n_train, n_sym - n_train), M=16, numIter=2, backend="pallas")

    def chain(sig_ri, ref_ri):
        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        ref = (ref_ri[..., 0] + 1j * ref_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(jnp.asarray(pulse), sig)
        x = edc(x, edc_cfg)
        x = pnorm(x)
        y = mimo_adapt_equalizer(x, eq_cfg, symb_ref=ref)
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    rng = np.random.default_rng(0)
    sym = const[rng.integers(0, 16, size=(n_sym, 2))]
    x = np.zeros((n_sym * sps, 2), complex)
    x[::sps] = sym
    mix = np.array([[0.9, 0.15 + 0.05j], [-0.1 + 0.08j, 0.95]])
    sig = x @ mix.T + 0.01 * (rng.normal(size=x.shape)
                              + 1j * rng.normal(size=x.shape))
    import jax.numpy as jnp  # noqa: F811

    sig_ri = jnp.asarray(np.stack([sig.real, sig.imag], -1).astype(
        np.float32))
    ref_ri = jnp.asarray(np.stack([sym.real, sym.imag], -1).astype(
        np.float32))
    run = jax.jit(chain)
    float(run(sig_ri, ref_ri))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(sig_ri, ref_ri))
        times.append(time.perf_counter() - t0)
    return n_sym / min(times) / 1e6


def run_fec_decode(batch=128, early_exit=False, snr_db=2.3,
                   schedule="flooding"):
    """DVB-S2 64800b R4/5 BP decode (min-sum, bf16), Mbit/s.

    The quasi-cyclic roll-based decoder (comm/fec_qc.py); backend='auto'
    resolves to the resident-totals megakernel on accelerators (round 4;
    kernels/qc_mega.py) — the decode_ldpc default for DVB-S2 graphs;
    bench_fec.py has the layout/dtype/batch sweep.

    ``early_exit=False`` (the throughput-comparable fixed-20 number) uses
    the synthetic high-SNR LLR workload AND the MSA algorithm of rounds
    1-4 (kept for round-over-round comparability). ``early_exit=True``
    measures the reference's break-on-parity serving semantics
    (fec.py:494-497; here the megakernel's per-chunk grid skip, round 5)
    at a REALISTIC operating point: all-zeros-codeword BPSK/AWGN LLRs at
    Es/N0 = ``snr_db`` dB — 0.4 dB above the pinned waterfall knee
    (tests/test_fec.py:558; FER 0 there, codewords converge in ~9-14 of
    the 20 iteration budget) — decoded with NMSA (the waterfall-pinned
    serving algorithm). Decisions are identical to fixed-iteration
    (pinned in tests); only wall time changes. NOTE: the two key families
    therefore differ in algorithm AND workload — do not attribute their
    delta to the grid skip alone; the controlled same-algorithm,
    same-LLR comparison is tools/bench_early_exit.py (NMSA fixed-20 mega
    430-440 vs mega+skip 452-584 Mbit/s at B=512).
    """
    import jax.numpy as jnp

    from opticommpy_tpu.comm import fec_qc

    dec = fec_qc.make_qc_decoder(64800, "4/5", 20, "MSA" if not early_exit
                                 else "NMSA", "bf16", early_exit=early_exit,
                                 schedule=schedule)
    rng = np.random.default_rng(0)
    if early_exit:
        sigma = np.sqrt(0.5 * 10 ** (-snr_db / 10))
        y = 1.0 + sigma * rng.normal(size=(64800, batch))
        llrs = jnp.asarray((2 * y / sigma**2).astype(np.float32))
    else:
        llrs = jnp.asarray((2.0 + rng.normal(
            scale=1.2, size=(64800, batch))).astype(np.float32))

    def run():
        out, iters, fail = dec(llrs)
        return float(jnp.mean(out) + jnp.sum(iters) + jnp.sum(fail))

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return 64800 * batch / min(times) / 1e6


def run_ar4ja_decode(batch=1024):
    """AR4JA 8192b R1/2 BP decode (NMSA-20, bf16), info-Mbit/s.

    The deep-space code family through the lifted-circulant decoder
    (comm/fec_lift.py); backend='auto' resolves to the fused Pallas
    iteration kernel on accelerators (kernels/lift_pallas.py, round-5
    continuation: 1.32x the XLA slice-roll iteration at this shape,
    decisions identical). Info-bit accounting (n*R*B/t) — NOTE
    bench_fec's historical lift rows counted CODE bits.
    """
    import jax.numpy as jnp

    from opticommpy_tpu.comm import fec_lift

    dec = fec_lift.make_lift_decoder("AR4JA", 8192, 0.5, 20, "NMSA", "bf16")
    tb = fec_lift.lift_tables("AR4JA", 8192, 0.5)
    rng = np.random.default_rng(0)
    llrs = jnp.asarray((2.0 + rng.normal(
        scale=1.2, size=(tb["V"] * tb["L"], batch))).astype(np.float32))

    def run():
        out, iters, fail = dec(llrs)
        return float(jnp.mean(out) + jnp.sum(iters) + jnp.sum(fail))

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return 8192 * 0.5 * batch / min(times) / 1e6


def run_adaptive_train_b8(batch=8):
    """BATCHED multi-stage adaptive training chain, aggregate Msym/s.

    The serving-shape training counterpart of run_adaptive_train: B=8
    signals' FULL multi-stage schedules (da-rde -> dd-lms, numIter=2) run
    on the batched Pallas recurrence kernels in one program
    (mimo_adapt_equalizer_batch, bit-exact per signal vs the single-signal
    path), with vmapped MF+EDC front end and one lane-packed BPS call
    (bench_dsp.adaptive_batch_multistage_chain). Reference training loop:
    equalization.py:266-319 at serving scale (VERDICT r4 item 5).
    """
    import jax
    import jax.numpy as jnp

    import bench_dsp

    out = bench_dsp.build_chain()
    sig, h0, adaptive_batch_ms = out[6], out[7], out[8]
    sig_b = jnp.broadcast_to(sig, (batch,) + sig.shape)
    h_b = jnp.broadcast_to(h0, (batch,) + h0.shape)
    run = jax.jit(adaptive_batch_ms)
    float(run(sig_b, h_b))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(sig_b, h_b))
        times.append(time.perf_counter() - t0)
    return batch * bench_dsp.N_SYM / min(times) / 1e6


def run_imdd_chain(batch=8, n_sym=2**16):
    """Batched IM-DD PAM4 serving chain (pipelines.imdd_dsp_chain_batch),
    aggregate Msym/s + worst per-signal BER.

    B real 10 km dispersive PAM4 links (pam_transmitter -> fiber ->
    photodiode, synthesized in a separate untimed jit): DC removal,
    symbol-rate sampling, per-row normalization and ALL signals' DFE
    recurrences in one sublane-batched VMEM kernel pass, BER computed
    in-jit (reference IM-DD workload: tx.py:231, equalization.py:1176;
    VERDICT r4 item 4).
    """
    import jax
    import jax.numpy as jnp

    from opticommpy_tpu.comm.metrics import fast_ber_calc
    from opticommpy_tpu.models import (LinearFiberConfig, PhotodiodeConfig,
                                       linear_fiber_channel, photodiode)
    from opticommpy_tpu.models.tx import PAMTxConfig, pam_transmitter
    from opticommpy_tpu.ops.signal import pnorm
    from opticommpy_tpu.pipelines import IMDDConfig, imdd_dsp_chain_batch

    cfg_tx = PAMTxConfig(M=4, Rs=25e9, SpS=8, nBits=2 * n_sym,
                         pulseType="nrz", power=3.0)
    fs = cfg_tx.Fs
    cfg = IMDDConfig(SpS_in=8, nTapsFF=15, nTapsFB=5, mu=2e-3, nTrain=8000)

    @jax.jit
    def synth(key):
        def one(k):
            k_tx, k_pd = jax.random.split(k)
            sig, symb = pam_transmitter(k_tx, cfg_tx)
            rx = linear_fiber_channel(
                sig, LinearFiberConfig(L=10, alpha=0.2, D=17, Fs=fs))
            i_rx = photodiode(rx, PhotodiodeConfig(Fs=fs, B=20e9), k_pd)
            return i_rx.astype(jnp.float32), symb.real.astype(jnp.float32)

        return jax.vmap(one)(jax.random.split(key, batch))

    i_b, ref_b = synth(jax.random.PRNGKey(5))
    i_b, ref_b = jax.block_until_ready(i_b), jax.block_until_ready(ref_b)

    @jax.jit
    def chain(i, r):
        y, mse = imdd_dsp_chain_batch(i, r, cfg)
        ref_n = jax.vmap(pnorm)(r)
        post = 2 * cfg.nTrain
        bers = jax.vmap(lambda yy, rr: fast_ber_calc(
            yy.real, rr, 4, "pam")[0][0])(y[:, post:], ref_n[:, post:])
        return jnp.max(bers)

    max_ber = float(chain(i_b, ref_b))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(i_b, ref_b))
        times.append(time.perf_counter() - t0)
    return batch * n_sym / min(times) / 1e6, max_ber


_BF16_PEAK = {  # per-chip dense bf16 matmul peak, FLOP/s
    "v4": 275e12,
    "v5e": 197e12, "v5 lite": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6e": 918e12, "v6 lite": 918e12,
}

_HBM_PEAK = {  # per-chip HBM bandwidth, bytes/s
    "v4": 1228e9,
    "v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
    "v5p": 2765e9, "v5": 2765e9,
    "v6e": 1640e9, "v6 lite": 1640e9,
}


def _chip_hbm_peak():
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag, peak in sorted(_HBM_PEAK.items(), key=lambda kv: -len(kv[0])):
        if tag in kind:
            return peak
    return None


def _fft_pair_bound_s(n, n_pol=2):
    """Analytic roofline for one permuted-order matmul fft+ifft pair.

    Per radix-r stage and polarization: the MXU executes 8*N*r real FLOPs
    (r complex MACs per output element), times 6 bf16 passes at
    precision='highest' f32 emulation; HBM moves the N-point c64 field in
    and out (16N bytes) plus the level-0 twiddle table (8N bytes — deeper
    levels broadcast a small table). Each stage is bounded by
    max(compute, bandwidth); the pair costs 2x the stage sum. This is the
    machine-checked form of docs/design.md §5's roofline claim.
    """
    peak_mxu = _chip_peak_bf16()
    peak_bw = _chip_hbm_peak()
    if not peak_mxu or not peak_bw:
        return None
    from opticommpy_tpu.kernels.matmul_fft import _factorize

    bound = 0.0
    for level, r in enumerate(_factorize(n)):
        compute = 6 * 8 * n * r / peak_mxu
        twiddle_bytes = 8 * n if level == 0 else 0
        bw = (16 * n + twiddle_bytes) / peak_bw
        bound += max(compute, bw)
    return 2 * n_pol * bound


def run_fft_roofline():
    """Measured matmul-FFT pair time vs its analytic roofline bound.

    Times K in-jit roundtrips of the (2, 2^20) c64 bench field through the
    permuted-order fwd/inv pair (kernels/matmul_fft.py) — the exact hot op
    of the fused SSFM — using a two-point slope so the ~25 ms tunnel
    dispatch overhead cancels. Returns (pair_seconds, roofline_frac).
    """
    import jax
    import jax.numpy as jnp

    from opticommpy_tpu.kernels.matmul_fft import fwd_factory

    fwd, inv, _ = fwd_factory(N_SAMPLES)

    def loop(k):
        @jax.jit
        def run(field_ri):
            e = field_ri[..., 0] + 1j * field_ri[..., 1]
            e = e.T  # (2, N)

            def body(x, _):
                return inv(fwd(x)), None

            out, _ = jax.lax.scan(body, e, None, length=k)
            return jnp.mean((out * jnp.conj(out)).real)

        return run

    x = jnp.asarray(_field())
    k1, k2 = 8, 72
    r1, r2 = loop(k1), loop(k2)
    float(r1(x)), float(r2(x))  # compile both
    t1 = min(_timed(lambda: float(r1(x))) for _ in range(3))
    t2 = min(_timed(lambda: float(r2(x))) for _ in range(3))
    pair_s = (t2 - t1) / (k2 - k1)
    bound = _fft_pair_bound_s(N_SAMPLES)
    frac = bound / pair_s if bound and pair_s > 0 else None
    return pair_s, frac


def run_nl_step_roofline():
    """Measured nonlinear-step overhead per SSFM step vs its HBM model.

    Times two in-jit scans over the (2, 2^20) c64 bench field with the
    matmul-FFT pair: (a) bare fft+ifft roundtrips, (b) full fused SSFM
    steps (ifft -> power/rotation -> fft -> linear-operator multiply,
    exactly models/channels.py:287-295's fstep_with). The two-point slope
    difference isolates everything BETWEEN the transforms: the nonlinear
    rotation pass and the frequency-domain linear-operator multiply.

    The analytic model charges two unfused elementwise passes at HBM
    bandwidth: rotation (read + write the 2-pol c64 field, 32N bytes;
    pch/exp fused in-register) and the lin_full multiply (read + write +
    the (N,) c64 operator, 40N bytes) — 72N bytes total. frac = model /
    measured; frac > 1 means XLA fused the passes into the FFT stages
    tighter than the two-pass model (design.md §5 has the discussion).
    Complements fft_roofline_frac so the whole step is attributable
    (VERDICT r4 item 6; reference step: channels.py:413-436).
    """
    import jax
    import jax.numpy as jnp

    from opticommpy_tpu.kernels.matmul_fft import fwd_factory

    fwd, inv, kmap = fwd_factory(N_SAMPLES)
    c_kms = 299792458.0 / 1e3
    lam = c_kms / 193.1e12
    alpha = ALPHA_DB / (10 * np.log10(np.e))
    beta2 = -(D_PS * lam**2) / (2 * np.pi * c_kms)
    kmap_np = np.asarray(kmap)

    def loop(k, with_nl):
        @jax.jit
        def run(field_ri):
            e = field_ri[..., 0] + 1j * field_ri[..., 1]
            e = e.T  # (2, N)
            # operator built ON DEVICE (complex constants would ride the
            # unimplemented complex-transfer path on the tunnel)
            w = 2 * jnp.pi * FS * jnp.fft.fftfreq(N_SAMPLES)
            lin_full = jnp.exp(
                (-(alpha / 2) + 1j * (beta2 / 2) * w**2) * HZ
            ).astype(jnp.complex64)[jnp.asarray(kmap_np)]

            def body_nl(x, _):
                et = inv(x)
                pch = jnp.sum((et * jnp.conj(et)).real, axis=0)
                rot = jnp.exp(1j * ((8 / 9) * GAMMA * HZ) * pch).astype(
                    et.dtype)
                return fwd(et * rot) * lin_full, None

            def body_plain(x, _):
                return fwd(inv(x)), None

            out, _ = jax.lax.scan(body_nl if with_nl else body_plain,
                                  fwd(e), None, length=k)
            return jnp.mean((out * jnp.conj(out)).real)

        return run

    x = jnp.asarray(_field())
    # best-of-6: the metric is a DIFFERENCE of two ~40 ms slopes, so
    # per-call jitter that the other metrics absorb shows up here
    # amplified (observed 7-32 us across runs at best-of-3)
    k1, k2 = 8, 72
    slopes = []
    for with_nl in (False, True):
        r1, r2 = loop(k1, with_nl), loop(k2, with_nl)
        float(r1(x)), float(r2(x))  # compile
        t1 = min(_timed(lambda: float(r1(x))) for _ in range(6))
        t2 = min(_timed(lambda: float(r2(x))) for _ in range(6))
        slopes.append((t2 - t1) / (k2 - k1))
    nl_s = slopes[1] - slopes[0]
    peak_bw = _chip_hbm_peak()
    if peak_bw is None or nl_s <= 0:
        return nl_s, None
    bound = 72 * N_SAMPLES / peak_bw
    return nl_s, bound / nl_s


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _chip_peak_bf16():
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag, peak in sorted(_BF16_PEAK.items(), key=lambda kv: -len(kv[0])):
        if tag in kind:
            return peak
    return None


def flop_analytics(samples_per_s):
    """Analytic FLOP accounting of the 500-step symmetric-split SSFM.

    - model_flops: algorithmic cost — per step, 2 pols x (FFT + IFFT) at
      5 N log2 N real FLOPs each (the standard FFT count; the fused linear
      operator is folded into the transforms) plus ~40 N for the nonlinear
      power/rotation pass.
    - mxu_flops: what the MXU actually executes on the matmul-FFT path —
      8 N r real FLOPs per radix-r stage per transform (complex MAC = 8),
      times 6 bf16 passes (f32 = bf16x6 emulation at precision=HIGHEST).
    - mfu / mxu_util: the above over the chip's dense bf16 peak.
    """
    n_steps = int(N_SPANS * L_SPAN / HZ)
    dt = N_SAMPLES / samples_per_s
    model_flops = n_steps * (
        2 * 2 * 5 * N_SAMPLES * math.log2(N_SAMPLES) + 40 * N_SAMPLES)
    from opticommpy_tpu.kernels.matmul_fft import _factorize

    radices = _factorize(N_SAMPLES)
    mxu_flops = n_steps * 4 * 8 * N_SAMPLES * sum(radices) * 6
    out = {
        "flops_per_s": round(model_flops / dt / 1e9, 1) * 1e9,
        "mxu_flops_per_s": round(mxu_flops / dt / 1e9, 1) * 1e9,
    }
    peak = _chip_peak_bf16()
    if peak:
        out["mfu"] = round(model_flops / dt / peak, 5)
        out["mxu_util"] = round(mxu_flops / dt / peak, 4)
    return out


def main():
    # the DSP chain runs FIRST: measuring it after the SSFM program costs it
    # ~15% (residual device state from the big propagation program); the
    # SSFM headline is order-insensitive (3.27M samples/s either way)
    def _aux(label, fn):
        # auxiliary metrics must never break the headline, but a failure
        # must be VISIBLE (round-4 lesson: a silent fallback masked the
        # megakernel never running) — report it on stderr and omit the key
        try:
            return fn()
        except Exception as e:
            print(f"bench.py: auxiliary metric {label} failed: {e!r}",
                  file=sys.stderr)
            return None

    chain = _aux("dsp_chain", lambda: round(run_dsp_chain(), 3))
    cr_chain = _aux("cr_chain", lambda: round(run_cr_chain(), 3))
    train = _aux("adaptive_train", lambda: round(run_adaptive_train(), 3))
    train_b8 = _aux("adaptive_train_b8",
                    lambda: round(run_adaptive_train_b8(), 3))
    imdd = _aux("imdd_chain", run_imdd_chain)
    fec_mbps = _aux("fec_decode_b128", lambda: round(run_fec_decode(), 1))
    fec_mbps_512 = _aux("fec_decode_b512",
                        lambda: round(run_fec_decode(batch=512), 1))
    fec_ee = _aux("fec_decode_b128_earlyexit",
                  lambda: round(run_fec_decode(early_exit=True), 1))
    fec_ee_512 = _aux("fec_decode_b512_earlyexit",
                      lambda: round(run_fec_decode(batch=512,
                                                   early_exit=True), 1))
    fec_lay_512 = _aux("fec_decode_b512_layered",
                       lambda: round(run_fec_decode(
                           batch=512, early_exit=True,
                           schedule="layered"), 1))
    ar4ja = _aux("ar4ja_decode_b1024",
                 lambda: round(run_ar4ja_decode(), 1))
    _fft = _aux("fft_roofline", run_fft_roofline)
    fft_pair, fft_frac = _fft if _fft is not None else (None, None)
    _nl = _aux("nl_step_roofline", run_nl_step_roofline)
    nl_s, nl_frac = _nl if _nl is not None else (None, None)
    tpu_sps, sps_runs = run_tpu()
    base_sps = run_numpy_baseline()
    med = sps_runs[len(sps_runs) // 2]
    result = {
        "metric": ("manakovSSF samples/s/chip "
                   "(11ch 16QAM polmux WDM, 5x50km, hz=0.5km)"),
        "value": round(tpu_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(tpu_sps / base_sps, 2),
        # run-to-run variance made round-3/4 prose drift from the committed
        # JSON (VERDICT r4 weak 1/item 7): the artifact now carries the
        # in-process median and spread so quoted numbers are checkable
        "value_median": round(med, 1),
        "spread_pct": round(100 * (sps_runs[-1] - sps_runs[0]) / med, 2),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    result.update(flop_analytics(tpu_sps))
    if chain is not None:
        result["dsp_chain_Msym_per_s_batch8"] = chain
    if cr_chain is not None:
        result["cr_chain_ffw_Msym_per_s_b8"] = cr_chain
    if train is not None:
        result["adaptive_train_Msym_per_s"] = train
    if train_b8 is not None:
        result["adaptive_train_Msym_per_s_b8"] = train_b8
    if imdd is not None:
        imdd_msps, imdd_ber = imdd
        if imdd_ber < 1e-3:
            result["imdd_chain_Msym_per_s_b8"] = round(imdd_msps, 3)
            result["imdd_chain_max_ber"] = imdd_ber
        else:
            print(f"bench.py: imdd chain BER check failed ({imdd_ber}); "
                  "key omitted", file=sys.stderr)
    if fec_mbps is not None:
        result["dvbs2_decode_Mbit_per_s_b128"] = fec_mbps
    if fec_mbps_512 is not None:
        result["dvbs2_decode_Mbit_per_s_b512"] = fec_mbps_512
    if fec_ee is not None:
        result["dvbs2_decode_Mbit_per_s_b128_earlyexit"] = fec_ee
    if fec_ee_512 is not None:
        result["dvbs2_decode_Mbit_per_s_b512_earlyexit"] = fec_ee_512
    if fec_lay_512 is not None:
        # opt-in serial-C schedule (schedule='layered'): same workload as
        # the earlyexit key; ~1.4x it via ~1.8x fewer sweeps (round 5)
        result["dvbs2_decode_Mbit_per_s_b512_layered"] = fec_lay_512
    if ar4ja is not None:
        # info-bit accounting; auto -> fused Pallas lift iteration kernel
        result["ar4ja_decode_info_Mbit_per_s_b1024"] = ar4ja
    if fft_pair is not None:
        result["fft_pair_us"] = round(fft_pair * 1e6, 1)
    if fft_frac is not None:
        result["fft_roofline_frac"] = round(fft_frac, 3)
    if nl_s is not None:
        result["nl_step_us"] = round(nl_s * 1e6, 1)
    if nl_frac is not None:
        result["nl_step_roofline_frac"] = round(nl_frac, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
