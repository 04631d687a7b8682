"""End-to-end CLI tests: generate -> attack -> aggregate -> certify at tiny
resolution with random weights (the reference has no CLI tests at all;
SURVEY.md §4)."""

import os
import os.path as osp

import numpy as np
import pytest

from certifyingfacerecognition_tpu.cli import certify, generate_data, \
    main_attack

RES = 16


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cwd = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def data_dir(workdir):
    out = osp.join(workdir, "data")
    generate_data.main(["-m", "stylegan_ffhq", "-o", out, "-n", "4",
                        "-s", "w", "--resolution", str(RES),
                        "--batch-size", "4"])
    return out


def test_generate_data_artifacts(data_dir):
    w = np.load(osp.join(data_dir, "w.npy"))
    assert w.shape == (4, 512)
    wp = np.load(osp.join(data_dir, "wp.npy"))
    assert wp.shape[0] == 4 and wp.shape[2] == 512
    ims = sorted(os.listdir(osp.join(data_dir, "ims")))
    assert ims == [f"{i:06d}.png" for i in range(4)]
    from PIL import Image

    im = np.asarray(Image.open(osp.join(data_dir, "ims", ims[0])))
    assert im.shape == (RES, RES, 3)


def test_generate_data_z_space(workdir):
    out = osp.join(workdir, "data_z")
    generate_data.main(["-m", "stylegan_ffhq", "-o", out, "-n", "2",
                        "-s", "z", "--resolution", str(RES),
                        "--batch-size", "2"])
    z = np.load(osp.join(out, "z.npy"))
    # Z codes are normalised to the sqrt(512) sphere.
    np.testing.assert_allclose(np.linalg.norm(z, axis=1),
                               np.sqrt(512.0), rtol=1e-5)
    assert np.load(osp.join(out, "w.npy")).shape == (2, 512)


@pytest.mark.slow
def test_attack_chunks_and_eval_files(workdir, data_dir):
    common = ["--data-dir", data_dir, "--chunks", "2", "--batch-size", "2",
              "--resolution", str(RES), "--iters", "2", "--restarts", "1",
              "--seed", "1"]
    main_attack.main(["--output-dir", "atk", "--num-chunk", "0"] + common)
    # chunk 1 reuses the cached embeddings
    main_attack.main(["--output-dir", "atk", "--num-chunk", "1",
                      "--load-embs"] + common)
    assert osp.isfile(osp.join(data_dir, "embs_insightface.npz"))
    logs = os.listdir(osp.join("exp_results", "atk", "logs"))
    assert "results_chunk0of2.txt" in logs and "results_chunk1of2.txt" in logs

    main_attack.main(["--output-dir", "atk", "--eval-files"])
    results = open(osp.join("exp_results", "atk", "results.txt")).read()
    assert "rate:" in results and "avg_mag:" in results


@pytest.fixture(scope="module")
def embs_cache(data_dir):
    """Certify loads (never computes) gallery embeddings, mirroring the
    reference's load_embs=True path — build the cache explicitly instead
    of depending on attack-test ordering."""
    path = osp.join(data_dir, "embs_insightface.npz")
    if not osp.isfile(path):
        main_attack.main(["--output-dir", "embs_seed", "--num-chunk", "0",
                          "--data-dir", data_dir, "--chunks", "4",
                          "--batch-size", "1", "--resolution", str(RES),
                          "--iters", "1", "--restarts", "1", "--seed", "9"])
    return path


def test_certify_tsv(workdir, data_dir, embs_cache):
    out = osp.join(workdir, "cert.tsv")
    certify.main(["--face-recog-model", "insightface", "--outfile", out,
                  "--sigma", "0.5", "--data-dir", data_dir,
                  "--resolution", str(RES), "--N", "40", "--N0", "10",
                  "--batch-sz", "20", "--max", "3"])
    rows = open(out).read().strip().split("\n")
    assert rows[0] == "idx\tlabel\tpredict\tcorrect\tgap\tradius\ttime"
    # --max 3 stops before identity index 2 ((i+1)==max), so rows for 0, 1.
    assert len(rows) == 3
    for row in rows[1:]:
        cols = row.split("\t")
        assert len(cols) == 7
        float(cols[4]), float(cols[5])

    # --resume: re-run with a higher --max appends ONLY the missing rows.
    certify.main(["--face-recog-model", "insightface", "--outfile", out,
                  "--sigma", "0.5", "--data-dir", data_dir,
                  "--resolution", str(RES), "--N", "40", "--N0", "10",
                  "--batch-sz", "20", "--max", "4", "--resume"])
    rows = open(out).read().strip().split("\n")
    assert [r.split("\t")[0] for r in rows[1:]] == ["0", "1", "2"]


@pytest.fixture(scope="module")
def embs_cache_sr8(data_dir):
    """Reduced-resolution (sr8) gallery cache for the cascade test."""
    path = osp.join(data_dir, "embs_insightface_sr8.npz")
    if not osp.isfile(path):
        main_attack.main(["--output-dir", "embs_seed_sr8", "--num-chunk",
                          "0", "--data-dir", data_dir, "--chunks", "4",
                          "--batch-size", "1", "--resolution", str(RES),
                          "--synthesis-resolution", str(RES // 2),
                          "--iters", "1", "--restarts", "1", "--seed", "9"])
    return path


def test_certify_cascade(workdir, data_dir, embs_cache, embs_cache_sr8):
    """--cascade: every emitted correct/certified row is native-grade by
    construction — bit-identical to the row a plain native-resolution run
    writes for that identity (same fold_in(key, i) stream)."""
    common = ["--face-recog-model", "insightface", "--sigma", "0.05",
              "--data-dir", data_dir, "--resolution", str(RES),
              "--N", "40", "--N0", "10", "--batch-sz", "20", "--max", "4"]
    out_native = osp.join(workdir, "cert_native.tsv")
    certify.main(["--outfile", out_native] + common)
    out_casc = osp.join(workdir, "cert_cascade.tsv")
    certify.main(["--outfile", out_casc, "--synthesis-resolution",
                  str(RES // 2), "--cascade"] + common)

    def rows(path):
        out = {}
        for line in open(path).read().strip().split("\n")[1:]:
            c = line.split("\t")
            out[int(c[0])] = c[:6]       # drop the timing column
        return out

    native, cascade = rows(out_native), rows(out_casc)
    assert set(native) == set(cascade) and len(cascade) == 3
    certified = [i for i, c in cascade.items() if c[3] == "1"]
    assert certified, "no certified rows — sigma too large for the test"
    for i in certified:
        assert cascade[i] == native[i], (i, cascade[i], native[i])

    # --cascade without a reduced synthesis resolution is a usage error.
    with pytest.raises(SystemExit):
        certify.main(["--outfile", osp.join(workdir, "x.tsv"),
                      "--cascade"] + common)


def test_certify_adaptive_guaranteed_matches_fixed(workdir, data_dir,
                                                   embs_cache):
    """--adaptive guaranteed through the CLI: decisions (and, because the
    tiny N here always runs to the final chunk unsettled or settles at it,
    gaps) must match the fixed-N TSV row for row."""
    common = ["--face-recog-model", "insightface", "--sigma", "0.5",
              "--data-dir", data_dir, "--resolution", str(RES),
              "--N", "40", "--N0", "10", "--batch-sz", "20", "--max", "3"]
    out_fixed = osp.join(workdir, "cert_fixed.tsv")
    certify.main(["--outfile", out_fixed] + common)
    out_adapt = osp.join(workdir, "cert_adapt.tsv")
    certify.main(["--outfile", out_adapt, "--adaptive", "guaranteed",
                  "--adaptive-chunk-batches", "1", "--adaptive-slack",
                  "0.0"] + common)

    def rows(path):
        return {line.split("\t")[0]: line.split("\t")[1:4]
                for line in open(path).read().strip().split("\n")[1:]}

    fixed, adapt = rows(out_fixed), rows(out_adapt)
    assert fixed == adapt, (fixed, adapt)

    # The in-graph engine (one dispatch per identity, zero host polls)
    # must emit the identical TSV.
    out_dev = osp.join(workdir, "cert_adapt_dev.tsv")
    certify.main(["--outfile", out_dev, "--adaptive", "guaranteed",
                  "--adaptive-engine", "device", "--adaptive-chunk-batches",
                  "1", "--adaptive-slack", "0.0"] + common)
    assert rows(out_dev) == adapt

    # Grouped dispatch (both identities in one program) must emit the
    # identical TSV again (ragged-group padding is pinned in
    # tests/test_adaptive_device.py).
    out_grp = osp.join(workdir, "cert_adapt_grp.tsv")
    certify.main(["--outfile", out_grp, "--adaptive", "guaranteed",
                  "--adaptive-engine", "device", "--adaptive-group", "2",
                  "--adaptive-chunk-batches", "1", "--adaptive-slack",
                  "0.0"] + common)
    assert rows(out_grp) == adapt

    # --adaptive-group without the device engine is a usage error.
    with pytest.raises(SystemExit):
        certify.main(["--outfile", osp.join(workdir, "y.tsv"),
                      "--adaptive", "guaranteed", "--adaptive-group", "2"]
                     + common)

    # sequential mode also runs end-to-end and emits schema-valid rows
    out_seq = osp.join(workdir, "cert_seq.tsv")
    certify.main(["--outfile", out_seq, "--adaptive", "sequential"] + common)
    assert len(open(out_seq).read().strip().split("\n")) == 3


def test_certify_chunked_job_array(workdir, data_dir, embs_cache):
    """--chunks/--num-chunk shard the identity axis for job arrays (the
    reference attack CLI's contract applied to certification): per-chunk
    TSVs are disjoint, their union is row-identical to the unchunked run
    (per-identity keys depend only on the global index), and chunking
    composes with the striding flags."""
    common = ["--face-recog-model", "insightface", "--sigma", "0.5",
              "--data-dir", data_dir, "--resolution", str(RES),
              "--N", "40", "--N0", "10", "--batch-sz", "20"]

    def rows(path):
        return {line.split("\t")[0]: line.split("\t")[1:6]
                for line in open(path).read().strip().split("\n")[1:]}

    out_full = osp.join(workdir, "cert_chunk_full.tsv")
    certify.main(["--outfile", out_full] + common)
    parts = {}
    for c in range(2):
        out_c = osp.join(workdir, f"cert_chunk_{c}.tsv")
        certify.main(["--outfile", out_c, "--chunks", "2",
                      "--num-chunk", str(c)] + common)
        parts[c] = rows(out_c)
    assert sorted(parts[0]) == ["0", "1"] and sorted(parts[1]) == ["2", "3"]
    assert {**parts[0], **parts[1]} == rows(out_full)

    # composes with --skip (strided list is split, not the raw range)
    out_s = osp.join(workdir, "cert_chunk_skip.tsv")
    certify.main(["--outfile", out_s, "--skip", "2", "--chunks", "2",
                  "--num-chunk", "1"] + common)
    assert sorted(rows(out_s)) == ["3"]

    with pytest.raises(SystemExit):
        certify.main(["--outfile", osp.join(workdir, "z.tsv"), "--chunks",
                      "2", "--num-chunk", "2"] + common)


def test_certify_anisotropic_composes_with_adaptive(workdir, data_dir,
                                                    embs_cache):
    """--anisotropic-sigma (sigma vector = sigma * red_ellipse_diag_inv,
    reference certify.py:85-95) composes with the adaptive estimator: the
    stopping rules depend only on counts, so the grouped device engine must
    reproduce the per-identity host-engine TSV exactly, and the radius
    column must stay sigma.min() * gap."""
    common = ["--face-recog-model", "insightface", "--sigma", "0.5",
              "--anisotropic-sigma", "--data-dir", data_dir, "--resolution",
              str(RES), "--N", "40", "--N0", "10", "--batch-sz", "20",
              "--max", "3", "--adaptive", "guaranteed",
              "--adaptive-chunk-batches", "1", "--adaptive-slack", "0.0"]
    out_host = osp.join(workdir, "cert_aniso_host.tsv")
    certify.main(["--outfile", out_host] + common)
    out_grp = osp.join(workdir, "cert_aniso_grp.tsv")
    certify.main(["--outfile", out_grp, "--adaptive-engine", "device",
                  "--adaptive-group", "2"] + common)

    def rows(path):
        return [line.split("\t")[:6]
                for line in open(path).read().strip().split("\n")[1:]]

    host, grp = rows(out_host), rows(out_grp)
    assert host == grp and len(host) == 2
    # radius = sigma.min() * gap with the anisotropic per-attribute sigma.
    from certifyingfacerecognition_tpu.ops.geometry import get_all_matrices

    region = get_all_matrices()
    sig_min = float(0.5 * np.min(np.asarray(region.red_ellipse_diag_inv)))
    for row in host:
        assert float(row[5]) == pytest.approx(sig_min * float(row[4]),
                                              rel=1e-2, abs=1e-6)


def test_certify_cascade_composes_with_adaptive_guaranteed(
        workdir, data_dir, embs_cache, embs_cache_sr8):
    """--cascade --adaptive guaranteed: both passes early-stop on futility
    brackets, so the emitted DECISIONS (predict/correct) must equal the
    plain cascade's row for row (gaps may be conservative)."""
    common = ["--face-recog-model", "insightface", "--sigma", "0.05",
              "--data-dir", data_dir, "--resolution", str(RES),
              "--N", "40", "--N0", "10", "--batch-sz", "20", "--max", "4",
              "--synthesis-resolution", str(RES // 2), "--cascade"]
    out_plain = osp.join(workdir, "casc_plain.tsv")
    certify.main(["--outfile", out_plain] + common)
    out_adapt = osp.join(workdir, "casc_adapt.tsv")
    certify.main(["--outfile", out_adapt, "--adaptive", "guaranteed",
                  "--adaptive-chunk-batches", "1"] + common)

    def decisions(path):
        return {line.split("\t")[0]: line.split("\t")[1:4]
                for line in open(path).read().strip().split("\n")[1:]}

    assert decisions(out_plain) == decisions(out_adapt)


def test_certify_sharded_gallery_mesh(workdir, data_dir, embs_cache):
    out = osp.join(workdir, "cert_mesh.tsv")
    certify.main(["--face-recog-model", "insightface", "--outfile", out,
                  "--sigma", "0.5", "--data-dir", data_dir,
                  "--resolution", str(RES), "--N", "24", "--N0", "8",
                  "--batch-sz", "8", "--max", "2",
                  "--mesh", "--mesh-id", "2"])
    rows = open(out).read().strip().split("\n")
    assert len(rows) == 2 and rows[1].split("\t")[0] == "0"


def test_generate_data_pggan(workdir):
    out = osp.join(workdir, "data_pggan")
    generate_data.main(["-m", "pggan_celebahq", "-o", out, "-n", "2",
                        "-s", "z", "--resolution", str(RES),
                        "--batch-size", "2"])
    z = np.load(osp.join(out, "z.npy"))
    assert z.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(z, axis=1),
                               np.sqrt(512.0), rtol=1e-5)
    assert len(os.listdir(osp.join(out, "ims"))) == 2


@pytest.mark.slow
def test_attack_facenet_and_checks(workdir, data_dir):
    """FaceNet FRM path (cosine distances, 160px input) + the pre-attack
    defense check battery, through the CLI."""
    main_attack.main(["--output-dir", "atk_fn", "--num-chunk", "0",
                      "--data-dir", data_dir, "--chunks", "4",
                      "--batch-size", "1", "--resolution", str(RES),
                      "--iters", "2", "--restarts", "1", "--seed", "2",
                      "--face-recog-method", "facenet", "--run-checks"])
    logs = os.listdir(osp.join("exp_results", "atk_fn", "logs"))
    assert "results_chunk0of4.txt" in logs
    assert osp.isfile(osp.join(data_dir, "embs_facenet.npz"))


def test_attack_no_lin_comb(workdir, data_dir):
    """Full 512-dim deltas (subspace + dense-ellipsoid projection in-graph);
    regression for the traced-Cholesky bug in Ellipsoid.cholesky_inv_t."""
    main_attack.main(["--output-dir", "atk_nlc", "--num-chunk", "0",
                      "--data-dir", data_dir, "--chunks", "4",
                      "--batch-size", "1", "--resolution", str(RES),
                      "--iters", "2", "--restarts", "1", "--seed", "4",
                      "--no-lin-comb"])
    logs = os.listdir(osp.join("exp_results", "atk_nlc", "logs"))
    assert "results_chunk0of4.txt" in logs


def test_attack_mesh_sharded_batch(workdir, data_dir):
    """Attack batch sharded over the 8 virtual devices."""
    main_attack.main(["--output-dir", "atk_mesh", "--num-chunk", "0",
                      "--data-dir", data_dir, "--chunks", "1",
                      "--batch-size", "4", "--resolution", str(RES),
                      "--iters", "2", "--restarts", "1", "--seed", "5",
                      "--mesh"])
    logs = os.listdir(osp.join("exp_results", "atk_mesh", "logs"))
    assert "results_chunk0of1.txt" in logs


def test_generate_data_wp_space_no_truncation(workdir):
    """WP codes are per-layer and bypass truncation (regression: they were
    re-truncated toward w_avg)."""
    from certifyingfacerecognition_tpu.models import stylegan
    from certifyingfacerecognition_tpu.utils import weights as W

    out = osp.join(workdir, "data_wp")
    generate_data.main(["-m", "stylegan_ffhq", "-o", out, "-n", "2",
                        "-s", "wp", "--resolution", str(RES),
                        "--batch-size", "2", "--weights", "random:3"])
    wp = np.load(osp.join(out, "wp.npy"))
    L = stylegan.num_layers(RES)
    assert wp.shape == (2, L, 512)
    # synthesizing the saved wp directly must reproduce the saved PNGs
    params = W.load_generator_params("random:3", resolution=RES)
    import jax.numpy as jnp
    img = np.asarray(stylegan.postprocess(stylegan.synthesis_apply(
        params, jnp.asarray(wp), resolution=RES)))
    from PIL import Image

    png = np.asarray(Image.open(osp.join(out, "ims", "000000.png")))
    np.testing.assert_allclose(
        (np.clip(img[0], 0, 1) * 255).astype(np.uint8), png, atol=1)


@pytest.mark.slow
def test_attack_autoattack_sequential(workdir, data_dir):
    """--attack-type autoattack: the reference's run_standard_evaluation
    sequence (apgd-ce -> apgd-t -> fab-t -> square) with robust-flag
    accumulation, end to end through the chunked CLI."""
    main_attack.main(["--output-dir", "atk_aa", "--num-chunk", "0",
                      "--attack-type", "autoattack", "--square-queries",
                      "10", "--autoattack-iters", "3",
                      "--data-dir", data_dir, "--chunks", "2",
                      "--batch-size", "2", "--resolution", str(RES),
                      "--seed", "1"])
    logs = os.listdir(osp.join("exp_results", "atk_aa", "logs"))
    assert "results_chunk0of2.txt" in logs
    log_text = open(osp.join("exp_results", "atk_aa", "chunk_0",
                             "log.txt")).read()
    assert "initial accuracy" in log_text
    assert "robust accuracy after APGD-CE" in log_text


@pytest.mark.slow
def test_attack_autoattack_plus(workdir, data_dir):
    """--attack-type autoattack-plus: the reference's 'plus' preset
    (autoattack.py:300-307) minus untargeted FAB (the one documented
    deviation), end to end through the chunked CLI with per-attack
    robust-accuracy reporting."""
    main_attack.main(["--output-dir", "atk_aap", "--num-chunk", "0",
                      "--attack-type", "autoattack-plus", "--square-queries",
                      "10", "--autoattack-iters", "2",
                      "--data-dir", data_dir, "--chunks", "2",
                      "--batch-size", "2", "--resolution", str(RES),
                      "--seed", "1"])
    logs = os.listdir(osp.join("exp_results", "atk_aap", "logs"))
    assert "results_chunk0of2.txt" in logs
    log_text = open(osp.join("exp_results", "atk_aap", "chunk_0",
                             "log.txt")).read()
    assert "initial accuracy" in log_text
    assert "robust accuracy after APGD-CE" in log_text


def test_attack_synthesis_resolution(workdir, data_dir):
    """--synthesis-resolution truncates the pyramid while loading full
    --resolution weights (reduced-resolution attack path)."""
    main_attack.main(["--output-dir", "atk_sr", "--num-chunk", "0",
                      "--data-dir", data_dir, "--chunks", "2",
                      "--batch-size", "2", "--resolution", str(RES),
                      "--synthesis-resolution", str(RES // 2),
                      "--iters", "2", "--restarts", "1", "--seed", "1"])
    logs = os.listdir(osp.join("exp_results", "atk_sr", "logs"))
    assert "results_chunk0of2.txt" in logs
