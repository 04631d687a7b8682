"""Profiling subsystem: PhaseTimer accumulation/report and trace capture."""

import glob
import os.path as osp
import time

import jax.numpy as jnp

from certifyingfacerecognition_tpu.utils import profiling as P


def test_phase_timer_accumulates_and_reports():
    t = P.PhaseTimer()
    for _ in range(3):
        with t.phase("work"):
            time.sleep(0.01)
    with t.phase("other"):
        time.sleep(0.005)
    assert t.counts["work"] == 3 and t.counts["other"] == 1
    assert t.totals["work"] >= 0.03
    rep = t.report()
    assert "work" in rep and "3x" in rep and "%" in rep
    t.reset()
    assert not t.totals


def test_phase_timer_sync_pulls_block_result():
    t = P.PhaseTimer()
    with t.phase("compute") as ph:
        r = ph.sync(jnp.arange(4).sum())
    assert int(r) == 6
    assert t.counts["compute"] == 1


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with P.trace(logdir):
        with P.annotate("phase-x"):
            jnp.square(jnp.arange(128.0)).block_until_ready()
    files = glob.glob(osp.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, "no trace artifact written"


def test_measure_subtracts_sync_floor():
    """measure() returns ~0 for a trivial op (the sync floor dominates and
    is subtracted), and a sane positive time for real work."""
    import jax
    import jax.numpy as jnp
    from certifyingfacerecognition_tpu.utils import profiling

    f = jax.jit(lambda x: x + 1.0)
    t = profiling.measure(f, jnp.zeros((8, 128)))
    assert 0.0 <= t < 0.05, t

    g = jax.jit(lambda x: jnp.sin(x).sum())
    t2 = profiling.measure(g, jnp.zeros((2048, 2048)), subtract_sync=False)
    assert t2 > 0.0
