"""Profiling and numeric-debugging subsystems.

The reference has only commented-out hooks (profiler="simple",
train_online__.py:1172; torch.compile :1132) and numeric sanitizers
(detect_anomaly, np.seterr). Here both are first-class:

- trace(): jax.profiler trace context writing a TensorBoard-compatible trace,
- StepTimer: wall-clock rays/sec that *fetches a scalar* to close timing
  (block_until_ready is unreliable over tunneled TPU backends),
- enable_nan_checks(): jax_debug_nans (the detect_anomaly equivalent), plus
  numpy seterr like the reference main (train_online__.py:1223).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks():
    """Debug mode: raise on NaN in any jitted computation + numpy errors.

    Equivalent of the reference's detect_anomaly=True
    (train_app_init__.py:264) and np.seterr(all="raise")."""
    import jax

    jax.config.update("jax_debug_nans", True)
    np.seterr(all="raise")


class StepTimer:
    """Throughput meter: call tick(loss, n_rays) each step; reads a scalar
    every `sync_every` steps so the device queue drains and the rate is real."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._rays = 0
        self._t0: Optional[float] = None
        self.rays_per_sec = float("nan")

    def tick(self, loss, n_rays: int):
        if self._t0 is None:
            float(loss)  # drain once so timing starts clean
            self._t0 = time.perf_counter()
            return self.rays_per_sec
        self._count += 1
        self._rays += n_rays
        if self._count % self.sync_every == 0:
            float(loss)  # host fetch closes the async queue
            dt = time.perf_counter() - self._t0
            self.rays_per_sec = self._rays / dt
            self._t0 = time.perf_counter()
            self._rays = 0
        return self.rays_per_sec
