"""Tests for auxiliary subsystems: profiling, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np

from opticommpy_tpu.utils.checkpoint import load_state, save_state
from opticommpy_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    timer = StageTimer()
    with timer("a"):
        x = timer.sync(jnp.fft.fft(jnp.ones(4096, jnp.complex64)))
    with timer("b"):
        y = timer.sync(jnp.sum(x))
    assert set(timer.times) == {"a", "b"}
    assert all(t >= 0 for t in timer.times.values())
    assert "total" in timer.table()


def test_checkpoint_roundtrip_complex_pytree(tmp_path):
    state = {
        "H": jnp.asarray(np.random.default_rng(0).normal(size=(2, 2, 15))
                         + 1j * np.random.default_rng(1).normal(size=(2, 2, 15))
                         ).astype(jnp.complex64),
        "field": jnp.ones((128, 2), jnp.complex64),
        "key": jax.random.PRNGKey(7),
        "step": jnp.asarray(42),
    }
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    loaded = load_state(path, like=state)
    for k in state:
        assert np.array_equal(np.asarray(loaded[k]), np.asarray(state[k])), k


def test_checkpoint_resume_equalizer_taps(tmp_path):
    """Save trained taps, reload, and keep filtering — the reference's
    H/H_/Hiter carry-over (equalization.py:191-195) with real serialization."""
    from opticommpy_tpu.dsp import MIMOEqualizerConfig, mimo_adapt_equalizer
    from opticommpy_tpu.dsp.equalization import mimo_apply
    from opticommpy_tpu.comm import modulate_gray
    from opticommpy_tpu.ops import fir_filter, pnorm, pulse_shape, upsample

    key = jax.random.PRNGKey(0)
    symb = pnorm(modulate_gray(
        jax.random.randint(key, (4000 * 4 * 2,), 0, 2), 16, "qam"
    ).reshape(4000, 2))
    pulse = jnp.asarray(pulse_shape("rrc", 2, 256, 0.1))
    sig = pnorm(fir_filter(pulse, upsample(symb, 2)))

    _, H, _, _, _ = mimo_adapt_equalizer(
        sig, MIMOEqualizerConfig(nTaps=7, mu=(2e-3,), SpS=2, alg=("nlms",), M=16),
        symb_ref=symb, return_results=True,
    )
    path = save_state(str(tmp_path / "taps.npz"), {"H": H})
    H2 = load_state(path, like={"H": H})["H"]
    y1 = mimo_apply(H, sig, 2)
    y2 = mimo_apply(H2, sig, 2)
    assert np.array_equal(np.asarray(y1), np.asarray(y2))


def test_enable_persistent_cache(tmp_path, monkeypatch):
    import jax
    from opticommpy_tpu.utils import enable_persistent_cache

    p = enable_persistent_cache(str(tmp_path / "xla"), min_compile_secs=0.0)
    try:
        assert p == str(tmp_path / "xla")
        import os
        assert os.path.isdir(p)
        # a compile should populate the cache directory
        import jax.numpy as jnp
        jax.jit(lambda x: jnp.sin(x) * 2)(jnp.ones(512)).block_until_ready()
        assert len(os.listdir(p)) >= 1
    finally:
        # FULL teardown: resetting only the dir leaves the initialized
        # cache object live with min_compile_time=0 — every later big
        # compile in the suite then cache-writes into the deleted
        # tmp_path and jax's put_executable_and_time SEGFAULTS the run
        # (observed at test_fec's early-exit while_loop compile)
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
