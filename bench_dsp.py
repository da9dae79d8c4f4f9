"""Auxiliary benchmark: coherent DSP chain throughput (Msym/s) on one chip.

Measures the receiver chain of the flagship workload (BASELINE.json config 3)
at 2 samples/symbol, 16-QAM polmux:

- stage timings for matched filter, CDC (overlap-save EDC), MIMO equalizer
  (adaptive scan and frozen-tap apply), and BPS carrier recovery,
- end-to-end Msym/s for the adaptive chain and for the converged
  (frozen-tap) chain — the production/serving path.

Prints one JSON line per configuration. Not invoked by the driver (bench.py
is the headline); run manually: ``python bench_dsp.py``.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N_SYM = 2**17  # symbols per polarization
SPS = 2
RS = 32e9


def build_chain():
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.dsp.carrier_recovery import bps
    from opticommpy_tpu.dsp.equalization import (
        EDCConfig,
        MIMOEqualizerConfig,
        _adapt_eq_stage,
        edc,
        mimo_apply,
    )
    from opticommpy_tpu.ops.filtering import pulse_shape
    from opticommpy_tpu.ops.signal import pnorm

    fs = RS * SPS
    n = N_SYM * SPS
    pulse = pulse_shape("rrc", SPS, 512, 0.1).astype(np.float32)
    const = gray_mapping(16, "qam")
    const = (const / np.sqrt(np.mean(np.abs(const) ** 2))).astype(np.complex64)

    edc_cfg = EDCConfig(L=400, D=16, Fs=fs, Rs=RS)
    eq_cfg = MIMOEqualizerConfig(nTaps=15, SpS=SPS, mu=(2e-3,), alg=("dd-lms",), M=16)

    n_taps = 15
    l_pad = n_taps // 2

    def adaptive_chain(sig_ri, h0_ri):
        from opticommpy_tpu.ops.filtering import fir_filter

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        h0 = (h0_ri[..., 0] + 1j * h0_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(pulse, sig)  # matched filter
        x = edc(x, edc_cfg)  # CD compensation
        x = pnorm(x)
        x_pad = jnp.pad(x, ((l_pad, l_pad + SPS + n_taps), (0, 0)))
        y, H, _, _, _, _ = _adapt_eq_stage(
            x_pad, x[::SPS][:N_SYM], h0, jnp.zeros_like(h0),
            jnp.tile(jnp.eye(n_taps, dtype=jnp.complex64), (2, 1, 1)),
            jnp.asarray(const), np.float32(1.32), np.abs(const[:1]),
            2e-3, 0.99, "dd-lms", SPS, n_taps, N_SYM, False, False,
        )
        est = bps(y, 32, jnp.asarray(const), 64)
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def frozen_chain(sig_ri, h_ri):
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.ops.filtering import fir_filter

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        H = (h_ri[..., 0] + 1j * h_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(pulse, sig)
        x = edc(x, edc_cfg)
        x = pnorm(x)
        y = mimo_apply(H, x, SPS)
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def fused_chain(sig_ri, h_ri):
        from opticommpy_tpu.dsp.equalization import mimo_apply_fused
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        H = (h_ri[..., 0] + 1j * h_ri[..., 1]).astype(jnp.complex64)
        # MF + EDC + pnorm + MIMO apply collapsed into ONE decimating
        # frequency-domain MIMO filter (all stages LTI + one scalar)
        y = mimo_apply_fused(H, sig, SPS, pre=pulse,
                             edc_config=edc_cfg)
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def fused_batch_chain(sig_b_ri, h_b_ri):
        """Whole serving batch in one program: vmapped fused front end, then
        ONE lane-packed Pallas BPS call with the batch folded into the mode
        axis (BPS is independent per mode-column; a vmapped kernel call per
        signal measured 2.7x slower than one 16-column call on v5e)."""
        from opticommpy_tpu.dsp.equalization import mimo_apply_fused
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas

        def front(sr, hr):
            sig = (sr[..., 0] + 1j * sr[..., 1]).astype(jnp.complex64)
            Hm = (hr[..., 0] + 1j * hr[..., 1]).astype(jnp.complex64)
            return mimo_apply_fused(Hm, sig, SPS, pre=pulse,
                                    edc_config=edc_cfg)

        y = jax.vmap(front)(sig_b_ri, h_b_ri)  # (B, nSym, 2)
        b, n_sym_, m = y.shape
        y_cols = jnp.moveaxis(y, 0, 1).reshape(n_sym_, b * m)
        est = bps_pallas(y_cols, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y_cols * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def adaptive_batch_chain(sig_b_ri, h_b_ri):
        """Batch-8 ADAPTIVE chain: vmapped MF+EDC front, ALL signals'
        equalizer recurrences in one Pallas kernel pass
        (mimo_eq_pallas_batch), one lane-packed BPS call."""
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.kernels.mimo_pallas import mimo_eq_pallas_batch
        from opticommpy_tpu.ops.filtering import fir_filter
        from opticommpy_tpu.ops.signal import pnorm

        def front(sr):
            sig = (sr[..., 0] + 1j * sr[..., 1]).astype(jnp.complex64)
            x = fir_filter(pulse, sig)
            x = edc(x, edc_cfg)
            return pnorm(x)

        x = jax.vmap(front)(sig_b_ri)  # (B, n, 2)
        d = x[:, ::SPS][:, :N_SYM]  # placeholder reference (timing workload)
        y, _ = mimo_eq_pallas_batch(
            x, d, const, alg="lms", n_taps=n_taps, sps=SPS, mu=2e-3,
            n_train=N_SYM // 8, interpret=jax.default_backend() == "cpu",
        )  # (B, nSym, 2)
        b, n_sym_, m = y.shape
        y_cols = jnp.moveaxis(y, 0, 1).reshape(n_sym_, b * m)
        est = bps_pallas(y_cols, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y_cols * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def adaptive_batch_multistage_chain(sig_b_ri, h_b_ri):
        """Batch-8 adaptive chain with the FULL multi-stage training
        schedule (da-rde -> dd-lms, numIter=2) on the batched kernels
        (mimo_adapt_equalizer_batch), one lane-packed BPS call."""
        from opticommpy_tpu.dsp.equalization import (
            MIMOEqualizerConfig, mimo_adapt_equalizer_batch)
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.ops.filtering import fir_filter
        from opticommpy_tpu.ops.signal import pnorm

        def front(sr):
            sig = (sr[..., 0] + 1j * sr[..., 1]).astype(jnp.complex64)
            x = fir_filter(pulse, sig)
            x = edc(x, edc_cfg)
            return pnorm(x)

        x = jax.vmap(front)(sig_b_ri)  # (B, n, 2)
        d = x[:, ::SPS][:, :N_SYM]  # placeholder reference (timing workload)
        mcfg = MIMOEqualizerConfig(
            nTaps=n_taps, SpS=SPS, mu=(5e-3, 1e-3),
            alg=("da-rde", "dd-lms"), L=(N_SYM // 8, N_SYM - N_SYM // 8),
            M=16, numIter=2, backend="pallas")
        y = mimo_adapt_equalizer_batch(x, mcfg, symb_ref=d)
        b, n_sym_, m = y.shape
        y_cols = jnp.moveaxis(y, 0, 1).reshape(n_sym_, b * m)
        est = bps_pallas(y_cols, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y_cols * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def cr_frozen_chain(sig_ri, h_ri):
        """Frozen-tap serving chain WITH the Gardner clock-recovery stage
        (runCR analogue): MF + EDC + pnorm + Pallas Gardner retiming +
        frozen MIMO apply + Pallas BPS, one jit. The Gardner kernel runs
        modes sequentially (lane-packing is structurally blocked by
        per-lane dynamic offsets — CLAUDE.md roadmap); measured round 5:
        the kernel alone does ~1.2 Msym/s/mode at 2^17-symbol blocks
        (0.6 Msym/s per 2-mode chain — 2.2x the round-1 small-block
        figure), and this row's end-to-end 0.597 Msym/s shows the rest
        of the serving chain is nearly free next to it."""
        from opticommpy_tpu.dsp.clock_recovery import (ClockRecoveryConfig,
                                                       gardner_clock_recovery)
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.ops.filtering import fir_filter

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        H = (h_ri[..., 0] + 1j * h_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(pulse, sig)
        x = edc(x, edc_cfg)
        x = pnorm(x)
        backend = "pallas" if jax.default_backend() != "cpu" else "scan"
        x = gardner_clock_recovery(
            x, ClockRecoveryConfig(kp=2e-3, ki=1e-5, isNyquist=True),
            backend=backend, static_out=True)
        y = mimo_apply(H, pnorm(x), SPS)
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def cr_ffw_frozen_chain(sig_ri, h_ri):
        """Frozen-tap serving chain with the FEEDFORWARD clock-recovery
        stage (crMethod='ffw'): per-block spectral-line timing estimate +
        block-parallel cubic resampler — dense XLA ops only, no
        recurrence, so unlike the Gardner row the retiming stage costs a
        few passes over the signal instead of a per-sample NCO loop."""
        from opticommpy_tpu.dsp.clock_recovery import (FFWClockRecoveryConfig,
                                                       ffw_clock_recovery)
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.ops.filtering import fir_filter

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        H = (h_ri[..., 0] + 1j * h_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(pulse, sig)
        x = edc(x, edc_cfg)
        x = pnorm(x)
        x = ffw_clock_recovery(x, FFWClockRecoveryConfig(rollOff=0.01))
        # v5e 2^17 syms (same run): gardner row 0.587, this row 4.491,
        # batch-8 16.52 Msym/s — the feedforward stage removes the
        # sequential-NCO ceiling from the clock-recovered serving path.
        y = mimo_apply(H, pnorm(x), SPS)
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def cr_ffw_batch_chain(sig_b_ri, h_b_ri):
        """Batch-8 serving chain with the feedforward CR stage vmapped
        per signal (each signal gets its own clock estimate — independent
        ADCs), then one lane-packed BPS call."""
        from opticommpy_tpu.dsp.clock_recovery import (FFWClockRecoveryConfig,
                                                       ffw_clock_recovery)
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.ops.filtering import fir_filter

        cr_cfg = FFWClockRecoveryConfig(rollOff=0.01)

        def one(sr, hr):
            sig = (sr[..., 0] + 1j * sr[..., 1]).astype(jnp.complex64)
            H = (hr[..., 0] + 1j * hr[..., 1]).astype(jnp.complex64)
            x = fir_filter(pulse, sig)
            x = edc(x, edc_cfg)
            x = pnorm(x)
            x = ffw_clock_recovery(x, cr_cfg)
            return mimo_apply(H, pnorm(x), SPS)

        y = jax.vmap(one)(sig_b_ri, h_b_ri)  # (B, nSym, 2)
        b, n_sym_, m = y.shape
        y_cols = jnp.moveaxis(y, 0, 1).reshape(n_sym_, b * m)
        est = bps_pallas(y_cols, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y_cols * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    def pallas_chain(sig_ri, h_ri):
        from opticommpy_tpu.kernels.bps_pallas import bps_pallas
        from opticommpy_tpu.kernels.mimo_pallas import mimo_eq_pallas
        from opticommpy_tpu.ops.filtering import fir_filter

        sig = (sig_ri[..., 0] + 1j * sig_ri[..., 1]).astype(jnp.complex64)
        x = fir_filter(pulse, sig)
        x = edc(x, edc_cfg)
        x = pnorm(x)
        d = x[::SPS][:N_SYM]  # placeholder reference (timing workload)
        y, _ = mimo_eq_pallas(
            x, d, const, alg="lms", n_taps=n_taps,
            sps=SPS, mu=2e-3, n_train=N_SYM // 8,
            interpret=jax.default_backend() == "cpu",
        )
        est = bps_pallas(y, 32, const, 64,
                         interpret=jax.default_backend() == "cpu")
        out = y * jnp.exp(1j * est)
        return jnp.mean((out * jnp.conj(out)).real)

    rng = np.random.default_rng(0)
    sig_ri = rng.normal(size=(n, 2, 2)).astype(np.float32) * 0.2
    h0 = np.zeros((2, 2, n_taps, 2), dtype=np.float32)
    h0[0, 0, n_taps // 2, 0] = 1.0
    h0[1, 1, n_taps // 2, 0] = 1.0
    return (adaptive_chain, frozen_chain, pallas_chain, fused_chain,
            fused_batch_chain, adaptive_batch_chain,
            jnp.asarray(sig_ri), jnp.asarray(h0),
            adaptive_batch_multistage_chain, cr_frozen_chain,
            cr_ffw_frozen_chain, cr_ffw_batch_chain)


def time_fn(fn, *args, reps=3):
    f = jax.jit(fn)
    float(f(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_rls(batch=8, n_sym=16384, n_taps=15, sps=2):
    """RLS kernel: single-signal vs sublane-batched aggregate (Msym/s)."""
    from opticommpy_tpu.comm.modulation import gray_mapping
    from opticommpy_tpu.kernels.rls_pallas import (
        mimo_rls_pallas, mimo_rls_pallas_batch)

    const = gray_mapping(16, "qam")
    const = const / np.sqrt(np.mean(np.abs(const) ** 2))
    rng = np.random.default_rng(3)
    sig = (rng.normal(size=(batch, n_sym * sps, 2))
           + 1j * rng.normal(size=(batch, n_sym * sps, 2))).astype(
        np.complex64) * 0.7
    symb = (rng.normal(size=(batch, n_sym, 2))
            + 1j * rng.normal(size=(batch, n_sym, 2))).astype(np.complex64)

    def run_single(sr, si, rr, ri):
        y, H, Sd = mimo_rls_pallas(sr + 1j * si, rr + 1j * ri, const,
                                   alg="rls", n_taps=n_taps, sps=sps)
        return jnp.mean(jnp.abs(y)) + jnp.mean(jnp.abs(H))

    def run_batch(sr, si, rr, ri):
        y, H, Sd = mimo_rls_pallas_batch(sr + 1j * si, rr + 1j * ri, const,
                                         alg="rls", n_taps=n_taps, sps=sps)
        return jnp.mean(jnp.abs(y)) + jnp.mean(jnp.abs(H))

    # f32 re/im pairs at the host boundary (complex transfers are
    # UNIMPLEMENTED on the TPU tunnel); combined inside the jit
    a1 = [jnp.asarray(x) for x in (sig[0].real, sig[0].imag,
                                   symb[0].real, symb[0].imag)]
    ab = [jnp.asarray(x) for x in (sig.real, sig.imag,
                                   symb.real, symb.imag)]
    t_s = time_fn(run_single, *a1)
    t_b = time_fn(run_batch, *ab)
    print(json.dumps({
        "metric": f"RLS 2x2 equalizer Pallas kernel ({n_taps} taps)",
        "single_Msym_per_s": round(n_sym / t_s / 1e6, 3),
        f"batch{batch}_Msym_per_s": round(batch * n_sym / t_b / 1e6, 3),
        "n_symbols": n_sym,
    }))


def bench_volterra(n_sym=16384, sps=2, batch=8):
    """3rd-order Volterra equalizer: XLA scan vs Pallas VMEM kernel."""
    from opticommpy_tpu.dsp.equalization import VolterraConfig, volterra
    from opticommpy_tpu.kernels.volterra_pallas import volterra_pallas

    rng = np.random.default_rng(4)
    sym = (2 * rng.integers(0, 4, size=n_sym) - 3).astype(np.float32)
    sig = np.repeat(sym, sps) + 0.1 * rng.normal(size=n_sym * sps)
    sig = (sig + 0.05 * sig**2).astype(np.float32)  # mild NL distortion
    cfg = VolterraConfig(n1Taps=13, n2Taps=7, n3Taps=5, SpS=sps, mu=1e-3,
                         nTrain=4000, order=3, M=4, constType="pam")

    def run(s, r):
        y, hs, mse = volterra(s, r, cfg)
        return jnp.mean(jnp.abs(y)) + jnp.mean(mse)

    def run_pl(s, r):
        y, hs, mse = volterra_pallas(s, r, cfg)
        return jnp.mean(jnp.abs(y)) + jnp.mean(mse)

    t = time_fn(run, jnp.asarray(sig), jnp.asarray(sym))
    t_pl = time_fn(run_pl, jnp.asarray(sig), jnp.asarray(sym))
    sig_b = jnp.asarray(np.stack(
        [sig + 0.02 * rng.normal(size=sig.shape) for _ in range(batch)]
    ).astype(np.float32))
    sym_b = jnp.broadcast_to(jnp.asarray(sym), (batch, n_sym))
    t_pb = time_fn(run_pl, sig_b, sym_b)
    print(json.dumps({
        "metric": "Volterra equalizer (order 3, 13/7/5 taps, PAM4)",
        "scan_Msym_per_s": round(n_sym / t / 1e6, 3),
        "pallas_Msym_per_s": round(n_sym / t_pl / 1e6, 3),
        f"pallas_batch{batch}_Msym_per_s": round(
            batch * n_sym / t_pb / 1e6, 3),
        "n_symbols": n_sym,
    }))


def bench_ofdm(batch=8, n_frames=273):
    """Batched OFDM receive (CP strip + FFT + pilot channel EQ), Msym/s.

    The OFDM serving story (VERDICT r4 'missing' list): B 16QAM-OFDM
    streams (Nfft=256, CP=32, pilots every 16 -> 240 data carriers/frame,
    ~2^16 data symbols each) over 40 km CD + AWGN, demodulated +
    BER-checked in ONE program. The receive path is pure
    FFT/elementwise/interp work — XLA-native, no kernel needed; this row
    records what it sustains at serving shape.
    """
    from opticommpy_tpu.comm import bit_source, modulate_gray
    from opticommpy_tpu.comm.metrics import fast_ber_calc
    from opticommpy_tpu.comm.ofdm import (OFDMConfig, demodulate_ofdm,
                                          modulate_ofdm)
    from opticommpy_tpu.models import (AWGNConfig, LinearFiberConfig, awgn,
                                       linear_fiber_channel)
    from opticommpy_tpu.ops import pnorm

    nfft, cp = 256, 32
    pilots = tuple(range(0, nfft, 16))
    cfg = OFDMConfig(Nfft=nfft, G=cp, SpS=1, pilotCarriers=pilots)
    ni = nfft - len(pilots)
    n_sym = ni * n_frames
    fs = 10e9

    @jax.jit
    def synth(key):
        def one(k):
            kb, kn = jax.random.split(k)
            bits = bit_source(kb, n_sym * 4)
            symb = pnorm(modulate_gray(bits, 16, "qam"))
            sig = modulate_ofdm(symb, cfg)
            rx = linear_fiber_channel(
                sig, LinearFiberConfig(L=40, alpha=0.0, D=17, Fs=fs))
            rx = awgn(rx, kn, AWGNConfig(snr=25.0))
            return (jnp.stack([rx.real, rx.imag], -1).astype(jnp.float32),
                    jnp.stack([symb.real, symb.imag], -1).astype(
                        jnp.float32))

        return jax.vmap(one)(jax.random.split(key, batch))

    rx_b, tx_b = synth(jax.random.PRNGKey(6))

    @jax.jit
    def serve(r_ri, t_ri):
        rx = (r_ri[..., 0] + 1j * r_ri[..., 1]).astype(jnp.complex64)
        tx = (t_ri[..., 0] + 1j * t_ri[..., 1]).astype(jnp.complex64)
        rec = jax.vmap(lambda s: demodulate_ofdm(s, cfg))(rx)
        bers = jax.vmap(
            lambda y, t: fast_ber_calc(y, t, 16, "qam")[0][0])(rec, tx)
        return jnp.max(bers)

    max_ber = float(serve(rx_b, tx_b))  # compile
    t = time_fn(lambda r, x: serve(r, x), rx_b, tx_b)
    print(json.dumps({
        "metric": f"OFDM batched receive (Nfft={nfft}, CP={cp}, 16QAM, "
                  f"pilot EQ, 40 km CD)",
        f"batch{batch}_Msym_per_s": round(batch * n_sym / t / 1e6, 3),
        "max_ber": max_ber,
        "n_data_symbols": n_sym,
    }))


def main():
    (adaptive, frozen, pallas, fused, fused_batch, adaptive_batch,
     sig, h0, adaptive_batch_ms, cr_frozen, cr_ffw, cr_ffw_b) = build_chain()
    t_ad = time_fn(adaptive, sig, h0)
    t_fr = time_fn(frozen, sig, h0)
    t_pl = time_fn(pallas, sig, h0)
    t_fu = time_fn(fused, sig, h0)
    t_cr = time_fn(cr_frozen, sig, h0)
    t_crf = time_fn(cr_ffw, sig, h0)
    batch = 8
    sig_b = jnp.broadcast_to(sig, (batch,) + sig.shape)
    h_b = jnp.broadcast_to(h0, (batch,) + h0.shape)
    t_fb = time_fn(fused_batch, sig_b, h_b)
    t_ab = time_fn(adaptive_batch, sig_b, h_b)
    t_ams = time_fn(adaptive_batch_ms, sig_b, h_b)
    t_crfb = time_fn(cr_ffw_b, sig_b, h_b)
    print(json.dumps({
        "metric": "coherent DSP chain (MF+EDC+2x2 MIMO+BPS), 16QAM polmux",
        "adaptive_Msym_per_s": round(N_SYM / t_ad / 1e6, 3),
        "adaptive_pallas_Msym_per_s": round(N_SYM / t_pl / 1e6, 3),
        "adaptive_batch8_Msym_per_s": round(batch * N_SYM / t_ab / 1e6, 3),
        "adaptive_batch8_multistage_Msym_per_s": round(
            batch * N_SYM / t_ams / 1e6, 3),
        "frozen_tap_Msym_per_s": round(N_SYM / t_fr / 1e6, 3),
        "frozen_tap_with_cr_Msym_per_s": round(N_SYM / t_cr / 1e6, 3),
        "frozen_tap_with_cr_ffw_Msym_per_s": round(N_SYM / t_crf / 1e6, 3),
        "cr_ffw_batch8_Msym_per_s": round(batch * N_SYM / t_crfb / 1e6, 3),
        "fused_frozen_Msym_per_s": round(N_SYM / t_fu / 1e6, 3),
        "fused_batch8_Msym_per_s": round(batch * N_SYM / t_fb / 1e6, 3),
        "n_symbols": N_SYM,
    }))
    bench_rls()
    bench_volterra()
    bench_ofdm()


if __name__ == "__main__":
    main()
