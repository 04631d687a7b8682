"""Mesh/multihost helpers: pod-mesh layouts and the CLI's jax.distributed
wiring (SURVEY.md §2.7 "DP over ICI/DCN"). The distributed runtime itself
can't start in a single-process test, so init is mocked at the JAX API
boundary and the code path above it is exercised for real."""

import numpy as np
import jax
import pytest

from certifyingfacerecognition_tpu.parallel import mesh as M


def test_get_pod_mesh_layouts():
    # 8 virtual CPU devices from conftest.
    m = M.get_pod_mesh(n_id=1)
    assert m.axis_names == (M.MC_AXIS, M.ID_AXIS)
    assert m.devices.shape == (8, 1)

    m2 = M.get_pod_mesh(n_id=2)
    assert m2.devices.shape == (4, 2)
    # mc is the major (contiguous-device) axis: ICI neighbours on a slice.
    flat = [d.id for d in m2.devices.reshape(-1)]
    assert flat == sorted(flat)

    with pytest.raises(AssertionError, match="not divisible"):
        M.get_pod_mesh(n_id=3)


def test_init_distributed_passes_explicit_args(monkeypatch):
    calls = {}

    def fake_init(**kwargs):
        calls.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    M.init_distributed("10.0.0.1:1234", num_processes=4, process_id=2)
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}

    # TPU-pod auto-detection path: no arguments at all.
    calls.clear()
    M.init_distributed()
    assert calls == {}


@pytest.mark.slow
def test_certify_cli_multihost_wiring(monkeypatch, tmp_path):
    """--multihost must call jax.distributed.initialize before certifying
    and still produce the TSV (process_index 0 is the writer)."""
    from certifyingfacerecognition_tpu.cli import certify, generate_data, \
        main_attack

    init_calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: init_calls.append(kw))

    monkeypatch.chdir(tmp_path)
    data = str(tmp_path / "data")
    generate_data.main(["-m", "stylegan_ffhq", "-o", data, "-n", "2",
                        "-s", "w", "--resolution", "16",
                        "--batch-size", "2"])
    main_attack.main(["--output-dir", "embs_mh", "--num-chunk", "0",
                      "--chunks", "2", "--batch-size", "1",
                      "--resolution", "16", "--iters", "1", "--restarts",
                      "1", "--data-dir", data, "--seed", "0"])
    out = str(tmp_path / "cert.tsv")
    certify.main(["--face-recog-model", "insightface", "--outfile", out,
                  "--sigma", "0.1", "--N", "12", "--N0", "4",
                  "--batch-sz", "4", "--resolution", "16",
                  "--data-dir", data, "--multihost", "--max", "2"])
    assert init_calls == [{}]
    rows = open(out).read().strip().splitlines()
    assert rows[0].startswith("idx\tlabel")
    assert len(rows) >= 2
