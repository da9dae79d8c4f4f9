"""Per-stage timing and device profiling helpers.

The reference's only observability is wall-clock ``time.time()`` blocks in
its notebooks ("DSP execution time benchmark" cell, SURVEY.md §5) plus tqdm
bars. Here:

- :class:`StageTimer` measures named pipeline stages with correct device
  synchronization (jax dispatch is async; each stage result is block-waited),
- :func:`trace` wraps a region with the JAX/XLA profiler, producing a
  TensorBoard-loadable trace of the compiled kernels.
"""

import time
from contextlib import contextmanager

import jax

__all__ = ["StageTimer", "trace"]


def _block(x):
    return jax.tree_util.tree_map(
        lambda v: v.block_until_ready() if hasattr(v, "block_until_ready") else v, x
    )


class StageTimer:
    """Accumulates wall-clock timings of named stages.

    >>> timer = StageTimer()
    >>> with timer("edc"):
    ...     out = timer.sync(edc(sig, cfg))
    >>> print(timer.table())
    """

    def __init__(self):
        self.times = {}

    @contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        yield
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    @staticmethod
    def sync(x):
        """Wait for all device work feeding ``x`` (use inside a stage block)."""
        return _block(x)

    def table(self):
        total = sum(self.times.values()) or 1.0
        lines = [f"{'stage':<24} {'time [s]':>10} {'share':>8}"]
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<24} {t:>10.3f} {100 * t / total:>7.1f}%")
        lines.append(f"{'total':<24} {total:>10.3f}")
        return "\n".join(lines)


@contextmanager
def trace(log_dir="/tmp/opticommpy_tpu_trace"):
    """Capture a JAX profiler trace of the enclosed region.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
