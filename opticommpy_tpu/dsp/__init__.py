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
    viterbi,
)
from opticommpy_tpu.dsp.clock_recovery import (  # noqa: F401
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
    mimo_apply,
    volterra,
)
from opticommpy_tpu.dsp.synchronization import (  # noqa: F401
    SyncConfig,
    sync_data_sequences,
)
