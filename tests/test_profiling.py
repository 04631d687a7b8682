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
