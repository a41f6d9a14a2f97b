"""Tests for auxiliary subsystems: prefetcher, step timer, debug checks."""

import time

import numpy as np

from startrax.data.prefetch import BatchPrefetcher
from startrax.utils.profiling import StepTimer


def test_prefetcher_yields_batches_and_reads_state():
    state = {"frame_hi": 3}

    def sample(rng, st):
        return {"frame": int(rng.integers(0, st["frame_hi"])), "x": rng.normal(size=4)}

    with BatchPrefetcher(sample, state, depth=2, workers=1) as pf:
        frames = [next(pf)["frame"] for _ in range(20)]
        assert all(0 <= f < 3 for f in frames)
        state["frame_hi"] = 1
        time.sleep(0.05)
        for _ in range(5):  # drain stale batches
            next(pf)
        frames2 = [next(pf)["frame"] for _ in range(10)]
        assert all(f == 0 for f in frames2)


def test_prefetcher_propagates_worker_errors():
    """A crashing sample_fn must surface in next(), not deadlock the consumer
    on an empty queue (this exact failure wedged a long training run)."""
    import pytest

    def bad(rng, st):
        raise IndexError("boom")

    with BatchPrefetcher(bad, {}, depth=2, workers=1) as pf:
        with pytest.raises(RuntimeError, match="prefetch worker failed"):
            next(pf)


def test_prefetcher_close_idempotent():
    pf = BatchPrefetcher(lambda rng, st: {"x": 1}, {}, depth=1, workers=2)
    next(pf)
    pf.close()
    pf.close()


def test_step_timer_reports_rate():
    import jax.numpy as jnp

    t = StepTimer(sync_every=5)
    loss = jnp.asarray(1.0)
    for _ in range(11):
        rate = t.tick(loss, n_rays=100)
    assert np.isfinite(t.rays_per_sec) and t.rays_per_sec > 0
