"""Reference-compatible API surface (OptiCommPy names).

Every public function of the reference ``optic`` package is exposed here under
its original camelCase name, delegating to the TPU-native implementations, so
a reference user can port scripts with an import change::

    from opticommpy_tpu import compat as optic
    const = optic.grayMapping(16, 'qam')
    Eo = optic.manakovSSF(Ei, param)

Functions that take the reference's mutable ``parameters`` bag accept either
the frozen config dataclasses or any object with the reference's attribute
names (converted via :func:`params_to_config`). Stochastic functions accept a
``seed`` keyword (converted to an explicit PRNG key).
"""

import dataclasses

import jax
import numpy as np

from opticommpy_tpu.comm import fec as _fec
from opticommpy_tpu.comm import metrics as _metrics
from opticommpy_tpu.comm import modulation as _mod
from opticommpy_tpu.comm import ofdm as _ofdm
from opticommpy_tpu.comm import sources as _sources
from opticommpy_tpu.dsp import carrier_recovery as _cpr
from opticommpy_tpu.dsp import clock_recovery as _clk
from opticommpy_tpu.dsp import equalization as _eq
from opticommpy_tpu.dsp import synchronization as _sync
from opticommpy_tpu.models import amplification as _amp
from opticommpy_tpu.models import channels as _ch
from opticommpy_tpu.models import config as _cfg
from opticommpy_tpu.models import devices as _dev
from opticommpy_tpu.models import perturbation as _pert
from opticommpy_tpu.models import tx as _tx
from opticommpy_tpu.ops import filtering as _filt
from opticommpy_tpu.ops import modulator as _opmod
from opticommpy_tpu.ops import noise as _noise
from opticommpy_tpu.ops import signal as _sig
from opticommpy_tpu.ops import whitening as _whit
from opticommpy_tpu.utils import bits as _bits
from opticommpy_tpu.utils import units as _units


class parameters:
    """Attribute-bag parameter struct (reference optic/utils.py:29).

    Provided for drop-in ergonomics; internally converted to the frozen
    config dataclasses.
    """

    def view(self):
        for attr, value in self.__dict__.items():
            print(f"{attr}: {value}")

    @staticmethod
    def _eng(value):
        # engineering notation (powers of 1000) for readable tables
        import numbers

        if isinstance(value, numbers.Real) and not isinstance(value, bool):
            v = float(value)
            if v != 0 and (abs(v) >= 1e4 or abs(v) < 1e-4):
                import math

                e = int(math.floor(math.log10(abs(v)) / 3) * 3)
                pre = {-15: "f", -12: "p", -9: "n", -6: "u", -3: "m", 0: "",
                       3: "k", 6: "M", 9: "G", 12: "T", 15: "P"}.get(e)
                if pre is not None:
                    return f"{v / 10**e:.1f} {pre}"
        return value

    def _rows(self):
        for name, value in vars(self).items():
            if isinstance(value, (list, tuple, np.ndarray)):
                yield name, "Array"
            else:
                yield name, self._eng(value)

    def table(self):
        """Print a Markdown table of the parameters (reference utils.py:86)."""
        out = "| Parameter Name | Value |\n|---|---|\n"
        out += "".join(f"| {n} | {v} |\n" for n, v in self._rows())
        print(out)

    def latex_table(self):
        """Print a LaTeX tabular of the parameters (reference utils.py:109)."""
        out = "\\begin{tabular}{|c|c|}\n\\hline\n"
        out += "Parameter Name & Value \\\\\n\\hline\n"
        out += "".join(f"{n} & {v} \\\\\n\\hline\n" for n, v in self._rows())
        out += "\\end{tabular}"
        print(out)

    def copy(self):
        import copy as _copy

        return _copy.deepcopy(self)


def params_to_config(param, config_cls, **overrides):
    """Build a frozen config from any object with reference attribute names."""
    fields = {f.name: f for f in dataclasses.fields(config_cls)}
    kwargs = {}
    for name in fields:
        if name in overrides:
            kwargs[name] = overrides[name]
        elif param is not None and hasattr(param, name):
            kwargs[name] = getattr(param, name)
    return config_cls(**kwargs)


def _key(seed):
    return jax.random.PRNGKey(0 if seed is None else seed)


# --- utils -----------------------------------------------------------------
lin2dB = _units.lin2db
dB2lin = _units.db2lin
dBm2W = _units.dbm2w
ber2Qfactor = _units.ber2qfactor
llr2bitProb = _units.llr2bit_prob
dec2bitarray = _bits.dec2bitarray
bitarray2dec = _bits.bitarray2dec


# --- dsp.core --------------------------------------------------------------
sigPow = _sig.sig_pow
signalPower = _sig.signal_power
pnorm = _sig.pnorm
anorm = _sig.anorm
upsample = _sig.upsample
decimate = lambda Ei, param: _sig.decimate(Ei, param.SpSin, getattr(param, "SpSout", 1))
finddelay = _sig.finddelay
symbolSync = _sig.symbol_sync
movingAverage = _sig.moving_average
delaySignal = _sig.delay_signal
freqShift = _sig.freq_shift
firFilter = _filt.fir_filter
blockwiseFFTConv = lambda x, h, NFFT=None, freqDomainFilter=False: _filt.overlap_save(
    x, h, nfft=NFFT, freq_domain_filter=freqDomainFilter
)
rrcFilterTaps = _filt.rrc_taps
rcFilterTaps = _filt.rc_taps
lowPassFIR = lambda fc, fs, N, typeF="rect": _filt.lowpass_fir(fc, fs, N, typeF)
calcMZM = _opmod.calc_mzm
calcPM = _opmod.calc_pm
levinson = _whit.levinson
autocorr = _whit.autocorr
estimateWhiteningFilter = _whit.estimate_whitening_filter


def pulseShape(param):
    return _filt.pulse_shape(
        getattr(param, "pulseType", "rrc"),
        getattr(param, "SpS", 2),
        getattr(param, "nFilterTaps", 256),
        getattr(param, "rollOff", 0.1),
    )


def resample(Ei, param):
    return _sig.resample(
        Ei, getattr(param, "inFs", 2), getattr(param, "outFs", 2),
        getattr(param, "N", 501),
    )


def clockSamplingInterp(x, inFs=1, outFs=1, jitter=0, seed=None):
    return _sig.clock_sampling_interp(x, inFs, outFs, jitter, _key(seed))


def quantizer(x, nBits=16, maxV=1, minV=-1):
    return _sig.quantizer(x, nBits, maxV, minV)


def gaussianComplexNoise(shapeOut, sigma2=1.0, seed=None):
    return _noise.gaussian_complex_noise(_key(seed), shapeOut, sigma2)


def gaussianNoise(shapeOut, sigma2=1.0, seed=None):
    return _noise.gaussian_noise(_key(seed), shapeOut, sigma2)


def phaseNoise(lw, Nsamples, Ts, seed=None):
    return _noise.phase_noise(_key(seed), lw, Nsamples, Ts)


def iqMixing(sig, param):
    return _sig.iq_mixing(
        sig, getattr(param, "Fs", 1.0), getattr(param, "ampImb", 0.0),
        getattr(param, "phaseImb", 0.0), getattr(param, "timeSkew", 0.0),
    )


# --- comm.modulation -------------------------------------------------------
grayCode = _mod.gray_code
grayMapping = _mod.gray_mapping
pamConst = _mod.pam_const
qamConst = _mod.qam_const
pskConst = _mod.psk_const
apskConst = _mod.apsk_const
minEuclid = _mod.min_euclid
demap = _mod.demap
modulateGray = _mod.modulate_gray
demodulateGray = _mod.demodulate_gray
detector = _mod.detector
def softMapper(llr, M, constType, prec=None):
    return _mod.soft_mapper(llr, M, constType)
softEstimator = _mod.soft_estimator
mlse = _mod.mlse


# --- comm.sources ----------------------------------------------------------
def bitSource(param):
    mode = getattr(param, "mode", "random")
    n_bits = getattr(param, "nBits", 1000)
    seed = getattr(param, "seed", None)
    if mode == "random":
        return _sources.bit_source(_key(seed), n_bits, "random")
    order = getattr(param, "order", 23)
    return _sources.bit_source(seed if isinstance(seed, int) else 1, n_bits,
                               "prbs", order)


prbsGenerator = _sources.prbs_generator
cazacSequence = _sources.cazac_sequence


def symbolSource(param):
    return _sources.symbol_source(
        _key(getattr(param, "seed", None)),
        getattr(param, "nSymbols", 1000),
        getattr(param, "M", 4),
        getattr(param, "constType", "qam"),
        getattr(param, "dist", "uniform"),
        getattr(param, "shapingFactor", 0.0),
        getattr(param, "px", None),
    )


# --- comm.metrics ----------------------------------------------------------
def bert(Irx, bitsTx=None, seed=123):
    """Reference metrics.py:37 signature: bitsTx=None regenerates the bit
    sequence from ``seed`` (matches ``bitSource`` with the same seed)."""
    if bitsTx is None:
        bitsTx = _sources.bit_source(_key(seed), np.asarray(Irx).shape[0],
                                     "random")
    return _metrics.bert(Irx, bitsTx)
fastBERcalc = _metrics.fast_ber_calc
calcLLR = _metrics.calc_llr
calcExtrLLR = _metrics.calc_extr_llr
monteCarloGMI = _metrics.monte_carlo_gmi
monteCarloMI = _metrics.monte_carlo_mi
calcMI = _metrics.calc_mi
Qfunc = _metrics.qfunc


def calcEVM(symb, M, constType, symbTx=None):
    return _metrics.calc_evm(symb, M, constType, symb_tx=symbTx)
theoryBER = _metrics.theory_ber
theoryMI = _metrics.theory_mi
GN_Model_NyquistWDM = _metrics.gn_model_nyquist_wdm
GNmodel_OSNR = _metrics.gn_model_osnr
calcLinOSNR = _metrics.calc_lin_osnr


# --- comm.ofdm -------------------------------------------------------------
hermit = _ofdm.hermit
zeroPad = _ofdm.zero_pad
calcSymbolRate = _ofdm.calc_symbol_rate


def modulateOFDM(symb, param):
    return _ofdm.modulate_ofdm(symb, params_to_config(param, _ofdm.OFDMConfig))


def demodulateOFDM(sig, param, returnChannel=False):
    return _ofdm.demodulate_ofdm(
        sig, params_to_config(param, _ofdm.OFDMConfig), returnChannel
    )


# --- comm.fec --------------------------------------------------------------
par2gen = _fec.par2gen
gaussElim = _fec.gauss_elim_gf2
inverseMatrixGF2 = _fec.inverse_matrix_gf2
triangularize = _fec.triangularize_gf2
triangP1P2 = _fec.triang_p1p2
readAlist = _fec.read_alist
writeAlist = _fec.write_alist
parseAlist = _fec.parse_alist
hammingParityCheckMatrix = _fec.hamming_parity_check_matrix
encodeHamming = lambda bits, param: _fec.encode_hamming(
    bits, getattr(param, "m", 3), getattr(param, "extended", False)
)[0]


def encodeLDPC(bits, param):
    mode = getattr(param, "mode", "DVBS2")
    H = getattr(param, "H", None)
    if mode == "DVBS2":
        return _fec.encode_ldpc(bits, H=H, config=_fec.LDPCConfig(mode="DVBS2"))
    P1 = getattr(param, "P1", None)
    P2 = getattr(param, "P2", None)
    if P1 is not None:
        return _fec.encode_ldpc(bits, H=H, P1=P1, P2=P2,
                                config=_fec.LDPCConfig(mode="triang"))
    return _fec.encode_ldpc(bits, H=H, G=getattr(param, "G", None),
                            config=_fec.LDPCConfig(mode="G"))


def decodeLDPC(llrs, param):
    return _fec.decode_ldpc(
        llrs, H=getattr(param, "H", None),
        config=_fec.LDPCConfig(
            maxIter=getattr(param, "maxIter", 25),
            alg=getattr(param, "alg", "SPA"),
        ),
    )


# --- models.devices --------------------------------------------------------
pm = _dev.pm


def mzm(Ai, u, param=None):
    return _dev.mzm(Ai, u, params_to_config(param, _cfg.MZMConfig))


def iqm(Ai, u, param=None):
    return _dev.iqm(Ai, u, params_to_config(param, _cfg.IQMConfig))


pbs = _dev.pbs
voa = _dev.voa
opticalHybrid2x4 = _dev.optical_hybrid_2x4


def photodiode(E, param=None):
    cfg = params_to_config(param, _cfg.PhotodiodeConfig)
    return _dev.photodiode(E, cfg, _key(getattr(param, "seed", None)))


def balancedPD(E1, E2, param=None):
    cfg = params_to_config(param, _cfg.PhotodiodeConfig)
    return _dev.balanced_pd(E1, E2, cfg, _key(getattr(param, "seed", None)))


def coherentReceiver(Es, Elo, paramFE=None, paramPD=None):
    fe = params_to_config(paramFE, _cfg.CoherentFrontendConfig)
    pd = params_to_config(paramPD, _cfg.PhotodiodeConfig,
                          Fs=fe.Fs) if paramPD is not None else None
    return _dev.coherent_receiver(Es, Elo, fe, pd,
                                  _key(getattr(paramFE, "seed", None)))


def pdmCoherentReceiver(Es, Elo, paramFE=None, paramPD=None):
    fe = params_to_config(paramFE, _cfg.PDMFrontendConfig)
    pd = params_to_config(paramPD, _cfg.PhotodiodeConfig,
                          Fs=fe.Fs) if paramPD is not None else None
    return _dev.pdm_coherent_receiver(Es, Elo, fe, pd,
                                      _key(getattr(paramFE, "seed", None)))


def edfa(Ei, param=None):
    cfg = params_to_config(param, _cfg.EDFAConfig)
    return _dev.edfa(Ei, cfg, _key(getattr(param, "seed", None)))


def basicLaserModel(param=None):
    cfg = params_to_config(param, _cfg.LaserConfig)
    return _dev.basic_laser_model(cfg, _key(getattr(param, "seed", None)))


def adc(sigIn, param):
    return _dev.adc(sigIn, params_to_config(param, _cfg.ADCConfig),
                    _key(getattr(param, "seed", None)))


def dac(sigIn, param):
    return _dev.dac(sigIn, params_to_config(param, _cfg.DACConfig),
                    _key(getattr(param, "seed", None)))


# --- models.channels -------------------------------------------------------
def linearFiberChannel(Ei, param):
    return _ch.linear_fiber_channel(Ei, params_to_config(param, _cfg.LinearFiberConfig))


def ssfm(Ei, param):
    return _ch.ssfm(Ei, params_to_config(param, _cfg.SSFMConfig),
                    _key(getattr(param, "seed", None)))


def manakovSSF(Ei, param):
    cfg = params_to_config(param, _cfg.SSFMConfig)
    return _ch.manakov_ssf(Ei, cfg, _key(getattr(param, "seed", None)))


nlinPhaseRot = _ch.nlin_phase_rot
convergenceCondition = lambda ex_fd, ey_fd, ex_c, ey_c: _ch.convergence_condition(
    np.stack([np.asarray(ex_fd), np.asarray(ey_fd)]),
    np.stack([np.asarray(ex_c), np.asarray(ey_c)]),
)


def awgn(sig, param=None, **kw):
    cfg = params_to_config(param, _cfg.AWGNConfig, **kw)
    return _ch.awgn(sig, _key(getattr(param, "seed", None)), cfg)


# --- models.tx -------------------------------------------------------------
def simpleWDMTx(param):
    cfg = params_to_config(param, _tx.WDMTxConfig)
    if hasattr(param, "powerPerChannel") and np.isscalar(param.powerPerChannel):
        cfg = dataclasses.replace(cfg, powerPerChannel=(float(param.powerPerChannel),))
    return _tx.simple_wdm_tx(_key(getattr(param, "seed", None)), cfg)


def pamTransmitter(param):
    cfg = params_to_config(param, _tx.PAMTxConfig)
    return _tx.pam_transmitter(_key(getattr(param, "seed", None)), cfg)


# --- models.amplification --------------------------------------------------
def edfaSM(Ei, Fs, Fc, param_edfa):
    cfg = params_to_config(param_edfa, _amp.EDFASMConfig)
    return _amp.edfa_sm(np.asarray(Ei), Fs, Fc, cfg)


get_spectrum = _amp.get_spectrum


# --- models.perturbation ---------------------------------------------------
def perturbationNLIN(Ein, param):
    cfg = params_to_config(param, _pert.PerturbationConfig)
    return _pert.perturbation_nlin(Ein, cfg)


calcPertCoeffMatrix = lambda param: _pert.calc_pert_coeff_matrix(
    params_to_config(param, _pert.PerturbationConfig)
)


# --- dsp.equalization ------------------------------------------------------
def edc(sigIn, param):
    return _eq.edc(sigIn, params_to_config(param, _eq.EDCConfig))


def mimoAdaptEqualizer(sigIn, param=None, symbRef=None):
    cfg = _eq.MIMOEqualizerConfig() if param is None else _eq.MIMOEqualizerConfig(
        numIter=getattr(param, "numIter", 1),
        nTaps=getattr(param, "nTaps", 15),
        mu=tuple(np.atleast_1d(getattr(param, "mu", [1e-3]))),
        lambdaRLS=getattr(param, "lambdaRLS", 0.99),
        SpS=getattr(param, "SpS", 2),
        L=tuple(getattr(param, "L")) if getattr(param, "L", None) else None,
        storeCoeff=getattr(param, "storeCoeff", False),
        runWL=getattr(param, "runWL", False),
        alg=tuple(np.atleast_1d(getattr(param, "alg", ["nlms"]))),
        constType=getattr(param, "constType", "qam"),
        M=getattr(param, "M", 4),
        shapingFactor=getattr(param, "shapingFactor", 0.0),
    )
    return _eq.mimo_adapt_equalizer(
        sigIn, cfg, symb_ref=symbRef,
        return_results=getattr(param, "returnResults", False),
    )


def manakovDBP(Ei, param):
    return _eq.manakov_dbp(Ei, params_to_config(param, _cfg.SSFMConfig))


def dfe(sigIn, symbRef, param):
    return _eq.dfe(sigIn, symbRef, params_to_config(param, _eq.DFEConfig))


def ffe(sigIn, symbRef, param):
    return _eq.ffe(sigIn, symbRef, params_to_config(param, _eq.FFEConfig))


def volterra(sigIn, symbRef, param):
    return _eq.volterra(sigIn, symbRef, params_to_config(param, _eq.VolterraConfig))


# --- dsp.carrierRecovery / clockRecovery / synchronization -----------------
def cpr(Ei, param=None, symbTx=None):
    cfg = params_to_config(param, _cpr.CPRConfig)
    return _cpr.cpr(Ei, cfg, symb_tx=symbTx,
                    pilot_ind=getattr(param, "pilotInd", None),
                    return_phases=getattr(param, "returnPhases", False))


bps = _cpr.bps
ddpll = _cpr.ddpll
viterbi = _cpr.viterbi
fourthPowerFOE = _cpr.fourth_power_foe


def gardnerClockRecovery(Ei, param=None):
    cfg = params_to_config(param, _clk.ClockRecoveryConfig)
    return _clk.gardner_clock_recovery(
        Ei, cfg, return_timing=getattr(param, "returnTiming", False)
    )


gardnerTED = _clk.gardner_ted
gardnerTEDnyquist = _clk.gardner_ted_nyquist
interpolator = _clk.interpolator
calcClockDrift = _clk.calc_clock_drift


def syncDataSequences(rx, tx, param):
    return _sync.sync_data_sequences(rx, tx, params_to_config(param, _sync.SyncConfig))


def OSA(x, Fs, Fc=193.1e12):
    from opticommpy_tpu.plot import osa as _osa

    return _osa(x, Fs, Fc)


# --- remaining reference-name aliases (utils/fec/metrics/plot/tx helpers) ---

decimal2bitarray = _bits.dec2bitarray  # scalar variant, utils.py:229
par2gen = _fec.par2gen
inverseMatrixGF2 = _fec.inverse_matrix_gf2
triangP1P2 = _fec.triang_p1p2
summarizeAlistFolder = _fec.summarize_alist_folder
plotBinaryMatrix = _fec.plot_binary_matrix


def GN_Model_NyquistWDM(Rs, Nch, Df, alpha, gamma, Ls, Ns, Ptx_dBm, D, Bref, Fc):
    """Reference metrics.py:851 argument order."""
    return _metrics.gn_model_nyquist_wdm(Rs, Nch, Df, alpha, gamma, Ls, Ns,
                                         Ptx_dBm, D, Bref, Fc)


ASE_NyquistWDM = _metrics.ase_nyquist_wdm


def GNmodel_OSNR(Rs, Nch, Df, Ptx, paramCh=None, Bref=12.5e9):
    """Reference metrics.py:917 signature (paramCh attribute bag)."""
    p = paramCh if paramCh is not None else parameters()
    return _metrics.gn_model_osnr(
        Rs, Nch, Df, Ptx,
        ltotal=getattr(p, "Ltotal", 800), l_span=getattr(p, "Lspan", 50),
        alpha_db=getattr(p, "alpha", 0.2), disp=getattr(p, "D", 16),
        gamma_=getattr(p, "gamma", 1.3), fc=getattr(p, "Fc", 193.1e12),
        nf_db=getattr(p, "NF", 4.5), b_ref=Bref,
    )


def setPowerforParSSFM(sig, powers):
    return _tx.set_power_for_par_ssfm(sig, powers, verbose=True)


def _plot_alias(name):
    import opticommpy_tpu.plot as _plot

    return getattr(_plot, name)


def pconst(*args, **kwargs):
    return _plot_alias("pconst")(*args, **kwargs)


def constHist(*args, **kwargs):
    return _plot_alias("const_hist")(*args, **kwargs)


def plotColoredConst(*args, **kwargs):
    return _plot_alias("plot_colored_const")(*args, **kwargs)


def plotDecisionBoundaries(*args, **kwargs):
    return _plot_alias("plot_decision_boundaries")(*args, **kwargs)


def eyediagram(*args, **kwargs):
    return _plot_alias("eyediagram")(*args, **kwargs)


def plotPSD(*args, **kwargs):
    return _plot_alias("plot_psd")(*args, **kwargs)


def animateConstGIF(*args, **kwargs):
    return _plot_alias("animate_const_gif")(*args, **kwargs)


edfParams = _amp.edf_params
getSpectrum = _amp.get_spectrum
