"""Receiver DSP chain: equalization, carrier/clock recovery, synchronization.

TPU-native counterpart of the reference ``optic/dsp`` package (minus core,
which lives in opticommpy_tpu.ops).
"""

from opticommpy_tpu.dsp.carrier_recovery import (  # noqa: F401
    CPRConfig,
    bps,
    cpr,
    ddpll,
    fourth_power_foe,
    residual_linewidth,
    viterbi,
)
from opticommpy_tpu.dsp.clock_recovery import (  # noqa: F401
    FFWClockRecoveryConfig,
    ffw_clock_recovery,
    ClockRecoveryConfig,
    calc_clock_drift,
    gardner_clock_recovery,
)
from opticommpy_tpu.dsp.equalization import (  # noqa: F401
    DFEConfig,
    EDCConfig,
    FFEConfig,
    MIMOEqualizerConfig,
    VolterraConfig,
    dfe,
    edc,
    ffe,
    manakov_dbp,
    mimo_adapt_equalizer,
    mimo_adapt_equalizer_batch,
    mimo_apply,
    mimo_apply_fused,
    volterra,
)
from opticommpy_tpu.dsp.synchronization import (  # noqa: F401
    SyncConfig,
    sync_data_sequences,
)

# Pallas TPU kernels for the serial recurrences (opt-in fast paths)
from opticommpy_tpu.kernels.bps_pallas import bps_pallas  # noqa: F401
from opticommpy_tpu.kernels.dfe_pallas import dfe_pallas, ffe_pallas  # noqa: F401
from opticommpy_tpu.kernels.ddpll_pallas import ddpll_pallas  # noqa: F401
from opticommpy_tpu.kernels.gardner_pallas import gardner_pallas  # noqa: F401
from opticommpy_tpu.kernels.mimo_pallas import (  # noqa: F401
    mimo_eq_pallas,
    mimo_eq_pallas_batch,
    mimo_lms_pallas,
)
