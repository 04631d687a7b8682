"""Weak-scaling structure of the sharded counts program (VERDICT r3 #7).

These asserts are the load-independent core of the multichip-scaling
claim: under weak scaling (fixed per-device batch, 1 -> 8 devices) the
compiled per-device FLOPs must stay CONSTANT (no replicated work added by
the partitioner) and the collective inventory must stay one counts-sized
psum per batch (KB-scale — the basis of the ICI model in docs/PERF.md
"Weak scaling and the ICI model"). Wall-clock parallel efficiency is NOT
asserted here: on a 1-core dev host the 8 virtual devices timeshare, so
wall-clock measures host scheduling, not the framework (the tool reports
it with honest semantics — tools/weak_scaling.py).
"""

import numpy as np

from certifyingfacerecognition_tpu.tools.weak_scaling import run_scan

N_GALLERY = 64


def test_weak_scaling_structure():
    rows = run_scan(device_counts=[1, 2, 4, 8], per_dev_batch=2,
                    n_batches=2, resolution=32, n_gallery=N_GALLERY,
                    time_it=False)
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]

    # Per-device compiled FLOPs constant under weak scaling (ideal = 1.0;
    # tolerate 2% for padding/partitioner noise).
    base = rows[0]["flops_per_device_per_sample"]
    assert base and base > 1e8          # the real pipeline, not a stub
    for r in rows[1:]:
        ratio = r["flops_per_device_per_sample"] / base
        assert abs(ratio - 1.0) < 0.02, (r["devices"], ratio)

    # Collectives: none at n=1; at n>1 exactly the per-batch counts psum
    # (num_classes f32 = 4*N_GALLERY bytes), nothing else — and the bytes
    # do NOT grow with device count.
    assert rows[0]["collectives"] == []
    for r in rows[1:]:
        kinds = {c["kind"] for c in r["collectives"]}
        assert kinds == {"all-reduce"}, r["collectives"]
        assert all(c["bytes"] == 4 * N_GALLERY for c in r["collectives"])
        assert r["collective_bytes_per_batch"] == 4 * N_GALLERY


def test_weak_scaling_collective_bytes_scale_with_classes_not_batch():
    """The psum payload is the class-count vector: it scales with the
    gallery size and is independent of the (per-device) batch — the fact
    that makes the MC axis embarrassingly parallel at any batch."""
    small = run_scan(device_counts=[2], per_dev_batch=2, n_batches=2,
                     resolution=32, n_gallery=32, time_it=False)[0]
    big_batch = run_scan(device_counts=[2], per_dev_batch=6, n_batches=2,
                         resolution=32, n_gallery=32, time_it=False)[0]
    big_gal = run_scan(device_counts=[2], per_dev_batch=2, n_batches=2,
                       resolution=32, n_gallery=128, time_it=False)[0]
    assert small["collective_bytes_per_batch"] == \
        big_batch["collective_bytes_per_batch"] == 4 * 32
    assert big_gal["collective_bytes_per_batch"] == 4 * 128
    np.testing.assert_allclose(
        big_batch["flops_per_device_per_sample"],
        small["flops_per_device_per_sample"], rtol=0.05)
