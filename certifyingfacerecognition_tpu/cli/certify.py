"""Certification CLI: randomized-smoothing certification of identities.

Surface mirror of /root/reference/certify.py (flags, TSV schema
``idx label predict correct gap radius time``, isotropic vs anisotropic
sigma, --skip/--max striding for job-array parallelism) with the MC loop
running as the fused, optionally mesh-sharded counting program
(smoothing/smooth.py here).

Reference semantics preserved:
  * anisotropic sigma = args.sigma * red_ellipse_diag^{-1} (certify.py:85-95);
  * radius = sigma.min() * gap (certify.py:141);
  * striding: certify every --skip-th identity, stop at --max
    (certify.py:120-125, note the reference's (i+1) arithmetic);
  * one TSV row appended per identity, so a killed job loses at most one.
"""

from __future__ import annotations

import argparse
import datetime
import os
import os.path as osp
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EMB_SIZE, FRS_METHODS
from ..models.pipeline import FacePipeline
from ..ops import geometry as G
from ..parallel.mesh import MC_AXIS, get_mesh
from ..smoothing.certificate import L2Certificate
from ..smoothing.smooth import Smooth
from ..utils import weights as W


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Certify face recognition examples (TPU-native)")
    parser.add_argument("--face-recog-model", required=True,
                        choices=FRS_METHODS, type=str,
                        help="type of model to load for face recognition")
    parser.add_argument("--outfile", required=True, type=str,
                        help="output csv file")
    parser.add_argument("--sigma", type=float, required=True,
                        help="noise hyperparameter")
    parser.add_argument("--anisotropic-sigma", action="store_true",
                        default=False,
                        help="Whether to use Anisotropic Sigma")
    # dataset options (certify.py:38-46)
    parser.add_argument("--skip", type=int, default=1,
                        help="skip examples in the dataset")
    parser.add_argument("--max", type=int, default=-1,
                        help="stop after a certain number of examples")
    # certification parameters (certify.py:48-62)
    parser.add_argument("--batch-sz", type=int, default=100,
                        help="certification batch size")
    parser.add_argument("--N0", type=int, default=100)
    parser.add_argument("--N", type=int, default=100000,
                        help="number of samples to use")
    parser.add_argument("--alpha", type=float, default=0.001,
                        help="failure probability")
    parser.add_argument("--load-n-embs", type=int, default=1_000_000,
                        help="num of embs. Default is all of them (1M)")
    # ---- TPU-framework additions ----
    parser.add_argument("--chunks", type=int, default=1,
                        help="job-array sharding of the identity axis: "
                             "split the post---skip/--max identity list "
                             "into this many contiguous chunks (the "
                             "reference's attack-CLI contract, "
                             "attack_utils/opts.py:48-51, applied to "
                             "certification — its certify.py has no "
                             "sharding flag). Chunk membership depends "
                             "only on --skip/--max, so --resume never "
                             "reshuffles chunks.")
    parser.add_argument("--num-chunk", type=int, default=0,
                        help="which chunk this job certifies (0-based)")
    parser.add_argument("--gen-weights", type=str, default="random")
    parser.add_argument("--frm-weights", type=str, default="random")
    parser.add_argument("--data-dir", type=str,
                        default=os.environ.get("CFR_DATA_DIR",
                                               "data/stylegan_ffhq_1M"))
    parser.add_argument("--embs-file", type=str, default=None,
                        help="Gallery embeddings (.npz with 'embs', or .pth)")
    parser.add_argument("--boundaries-dir", type=str, default=None)
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--synthesis-resolution", type=int, default=None,
                        help="Truncate synthesis at this resolution (uses "
                             "the matching early layers + ToRGB head of the "
                             "--resolution weights). The FRM consumes 112^2 "
                             "either way; synthesis is ~82%% of certification "
                             "time at 1024^2, so 256/512 trade fidelity for "
                             "3-10x throughput (docs/PERF.md 'Reduced-"
                             "resolution certification'). Gallery embeddings "
                             "must be computed at the same synthesis "
                             "resolution; the default cache name is then "
                             "embs_<model>_sr<res>.npz (cfr-attack with the "
                             "same --synthesis-resolution produces it).")
    parser.add_argument("--cascade", action="store_true", default=False,
                        help="Decision-safe reduced-resolution mode: run the "
                             "MC loop at --synthesis-resolution, and any "
                             "identity whose fast-path prediction matches its "
                             "label is RE-CERTIFIED at the native "
                             "--resolution before its row is written — every "
                             "emitted correct/certified row is native-grade "
                             "by construction, while rejections and "
                             "abstentions (the bulk at paper-scale sigma) "
                             "keep the 1.8-2.5x fast path. The reduced-"
                             "resolution failure mode is one-sided over-"
                             "certification (docs/PERF.md), which this "
                             "construction eliminates; the residual "
                             "deviation is conservative (a fast-path "
                             "rejection the native model would certify "
                             "loses that certification, never invents one).")
    parser.add_argument("--native-embs-file", type=str, default=None,
                        help="With --cascade: native-resolution gallery "
                             "embeddings (defaults to embs_<model>.npz in "
                             "--data-dir; --embs-file names the reduced-"
                             "resolution gallery)")
    parser.add_argument("--adaptive", type=str, default="off",
                        choices=["off", "guaranteed", "sequential"],
                        help="Early-stopping certification "
                             "(smoothing/smooth.certify_adaptive). "
                             "'guaranteed': deterministic futility bounds — "
                             "emitted certify/abstain decisions are provably "
                             "identical to the fixed-N run for the same seed "
                             "(certified radii conservative within "
                             "--adaptive-slack), so this composes with the "
                             "reference-decision contract. 'sequential': "
                             "alpha-spending checkpoints — much earlier "
                             "stops for clear-cut identities, decisions "
                             "aligned with fixed-N only statistically "
                             "(coverage still holds at --alpha). Off by "
                             "default: the reference estimator is fixed-N.")
    parser.add_argument("--adaptive-chunk-batches", type=int, default=8,
                        help="Batches between early-stop polls (with "
                             "--adaptive-engine host each poll costs one "
                             "~30 ms device sync; the device engine makes "
                             "even --adaptive-chunk-batches 1 free)")
    parser.add_argument("--adaptive-engine", type=str, default="host",
                        choices=["host", "device"],
                        help="'host': one dispatch + scalar pull per poll. "
                             "'device': the whole certification (selection, "
                             "MC loop, stopping rules) runs in ONE jitted "
                             "program — a lax.while_loop compares the "
                             "running success count against precomputed "
                             "Clopper-Pearson integer thresholds "
                             "(smoothing/adaptive_device.py); bit-identical "
                             "results except guaranteed-mode "
                             "--adaptive-gap-target (documented there)")
    parser.add_argument("--adaptive-group", type=int, default=1,
                        help="Device engine only: certify this many "
                             "identities per dispatch (lax.map over the "
                             "in-graph loop; results per identity are "
                             "bit-identical to group 1). Amortises the "
                             "per-dispatch launch + result-pull overhead "
                             "(~46 ms/id measured through the axon tunnel) "
                             "— the dominant cost once adaptive stopping "
                             "cuts compute to ~2 batches/id. Incompatible "
                             "with --cascade.")
    parser.add_argument("--adaptive-slack", type=float, default=0.1,
                        help="Stop a settled certification once its "
                             "(conservative) gap is within this fraction of "
                             "the best still-achievable gap")
    parser.add_argument("--adaptive-gap-target", type=float, default=None,
                        help="Deployment question 'certified at radius >= "
                             "sigma_min * TARGET?': stop as soon as that bit "
                             "is settled. In guaranteed mode the at-target "
                             "answer matches the fixed-N run per seed; this "
                             "is where guaranteed mode's large certify-side "
                             "savings come from (without it, full-radius "
                             "certifications must run to ~N by construction)")
    parser.add_argument("--dtype", type=str, default="fp32",
                        choices=["fp32", "bf16"])
    parser.add_argument("--mesh", action="store_true", default=False,
                        help="Shard the MC batch over all local devices")
    parser.add_argument("--mesh-id", type=int, default=1,
                        help="With --mesh: id-axis size; shards the gallery "
                             "over this many devices (1M-identity regime)")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="Initialise jax.distributed (one process per "
                             "host of a pod slice) before building the mesh; "
                             "coordinator/process args auto-detect on TPU "
                             "pods. Replaces the reference's SLURM job "
                             "arrays (README.md:17-18) with a real DCN-"
                             "spanning device mesh.")
    parser.add_argument("--coordinator-address", type=str, default=None,
                        help="host:port of process 0 (only needed off-TPU)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--resume", action="store_true", default=False,
                        help="Append to an existing outfile, skipping "
                             "already-certified identities")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def load_gallery(args, synthesis_resolution=None,
                 embs_file=None) -> np.ndarray:
    # see cli/main_attack.get_embs: reduced-resolution embeddings get
    # their own default cache name
    sr = f"_sr{synthesis_resolution}" if synthesis_resolution else ""
    path = embs_file or osp.join(
        args.data_dir, f"embs_{args.face_recog_model}{sr}.npz")
    # mmap .npy galleries: at 1M x 512 (2 GB) the rows stream straight to
    # the device put instead of living twice in host RAM.
    embs = W.load_embeddings(path, mmap=True)
    embs = embs[: args.load_n_embs]
    if embs.dtype != np.float32:
        embs = np.asarray(embs, np.float32)
    return embs


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    if args.multihost:
        # Must run before anything touches jax.devices(): afterwards the
        # device list spans the whole slice and --mesh/--mesh-id meshes
        # shard over ICI+DCN (SURVEY.md §2.7 "DP over ICI/DCN").
        from ..parallel.mesh import init_distributed

        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
        print(f"multihost: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    region = G.get_all_matrices(boundaries_dir=args.boundaries_dir)
    dirs = region.dirs.T                       # [k, 512] rows (certify.py:71)
    num_dirs = dirs.shape[0]

    # Memory-mapped: the certify loop touches one 512-float row per
    # identity, so the 1M-row file never has to fit in host RAM at once.
    dataset = np.load(osp.join(args.data_dir, "w.npy"), mmap_mode="r")
    dataset = dataset[: args.load_n_embs]
    gallery = load_gallery(args, args.synthesis_resolution, args.embs_file)
    assert len(gallery) == len(dataset), \
        f"{len(gallery)} embeddings vs {len(dataset)} latents"
    num_classes = dataset.shape[0]
    print(f"Found {num_classes} classes")
    print(f"Found {num_dirs} directions")

    if args.cascade and not (args.synthesis_resolution
                             and args.synthesis_resolution < args.resolution):
        raise SystemExit("--cascade requires --synthesis-resolution below "
                         "--resolution (it is the fast path being verified)")

    gallery_gb = gallery.size * 4 / 2**30
    if gallery_gb > 4.0 and not (args.mesh and args.mesh_id > 1):
        # Replicated per chip, a 1M-identity gallery plus the MC batch
        # blows the 16 GB HBM budget — point at the sharded path instead
        # of OOMing deep inside XLA (reference analogue: --load-n-embs,
        # certify.py:64-65).
        print(f"WARNING: {gallery_gb:.1f} GB gallery will be REPLICATED on "
              "every device; pass --mesh --mesh-id N to shard it over the "
              "id axis, or cap it with --load-n-embs")

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    gen_params = W.load_generator_params(args.gen_weights,
                                         resolution=args.resolution)
    frm_params = W.load_frm_params(args.frm_weights, args.face_recog_model)
    syn_res = args.synthesis_resolution or args.resolution

    # Sigma: scalar (isotropic) or per-attribute diagonal (certify.py:85-95).
    if args.anisotropic_sigma:
        sigma = args.sigma * np.asarray(region.red_ellipse_diag_inv)
    else:
        sigma = np.full((num_dirs,), args.sigma, np.float32)

    certificate = L2Certificate()
    mesh = None
    if args.mesh:
        if args.mesh_id > 1:
            from ..parallel.mesh import get_2d_mesh

            mesh = get_2d_mesh(len(jax.devices()) // args.mesh_id,
                               args.mesh_id)
        else:
            mesh = get_mesh(MC_AXIS)

    def build_smoothed(gallery_arr, resolution):
        """FacePipeline + (optionally mesh-sharded) Smooth at a synthesis
        resolution — built once for the main path, twice under --cascade
        (fast reduced-resolution + native verifier)."""
        pipe = FacePipeline(gen_params, frm_params, dirs=jnp.asarray(dirs),
                            frs_method=args.face_recog_model,
                            resolution=resolution, dtype=dtype,
                            gallery=jnp.asarray(gallery_arr))
        param_specs = None
        if args.mesh and args.mesh_id > 1:
            from jax.sharding import PartitionSpec as P

            from ..parallel.gallery import make_sharded_gallery_predict_fn

            predict_fn = make_sharded_gallery_predict_fn(
                pipe.embed_fn, jnp.asarray(dirs),
                method=args.face_recog_model)
            params = {"gen": gen_params, "frm": frm_params,
                      "gallery": pipe.gallery}
            param_specs = {"gen": P(), "frm": P(), "gallery": P("id")}
        else:
            predict_fn, params = pipe.predict_fn_with_params()
        return Smooth(predict_fn, num_classes, sigma, certificate,
                      noise_dim=num_dirs, batch_size=args.batch_sz,
                      mesh=mesh, params=params, param_specs=param_specs)

    smoothed = build_smoothed(gallery, syn_res)
    smoothed_native = None
    if args.cascade:
        native_gallery = load_gallery(args, None, args.native_embs_file)
        assert len(native_gallery) == num_classes, \
            f"native gallery {len(native_gallery)} vs {num_classes} latents"
        smoothed_native = build_smoothed(native_gallery, args.resolution)

    # Multihost: every process executes the same loop (the certify programs
    # are collective over the global mesh) but only process 0 owns the TSV.
    is_writer = not args.multihost or jax.process_index() == 0

    parent = osp.dirname(osp.abspath(args.outfile))
    os.makedirs(parent, exist_ok=True)
    done = set()
    if args.resume:
        # Artifact-level resume: one TSV row per identity means a killed
        # job loses at most one (SURVEY.md §5); re-runs skip finished rows.
        if osp.isfile(args.outfile):
            with open(args.outfile) as f:
                for line in f:
                    cols = line.split("\t")
                    if cols and cols[0].isdigit():
                        done.add(int(cols[0]))
        if args.multihost and jax.process_count() > 1:
            # Only process 0 writes the TSV, so on pods without a shared
            # filesystem the other processes would see no file, skip
            # nothing, and execute a DIFFERENT number of collective
            # certify programs than process 0 — a guaranteed deadlock.
            # Broadcast process 0's done set as a bitmask so every
            # process runs the identical iteration sequence.
            from jax.experimental import multihost_utils

            mask = np.zeros((num_classes,), np.bool_)
            for idx in done:
                if idx < num_classes:
                    mask[idx] = True
            if jax.process_index() != 0:
                mask[:] = False
            mask = np.asarray(multihost_utils.broadcast_one_to_all(mask))
            done = set(np.nonzero(mask)[0].tolist())
        print(f"Resuming: {len(done)} identities already certified")
    elif is_writer:
        with open(args.outfile, "w+") as f:
            print("idx\tlabel\tpredict\tcorrect\tgap\tradius\ttime", file=f,
                  flush=True)

    x = np.zeros((num_dirs,), np.float32)
    key = jax.random.PRNGKey(args.seed)

    # Reference striding arithmetic (certify.py:121-125), including its
    # quirky ordering (the --max break is only reached by indices that
    # pass --skip), then the job-array chunk split (contiguous, like the
    # reference attack CLI's --chunks/--num-chunk). Membership depends
    # only on the flags — never on the resume state — so re-running a
    # chunk after a crash certifies exactly the missing identities.
    strided = []
    for i in range(num_classes):
        if (i + 1) % args.skip != 0:
            continue
        if (i + 1) == args.max:
            break
        strided.append(i)
    if not 0 <= args.num_chunk < args.chunks:
        raise SystemExit("--num-chunk must be in [0, --chunks)")
    if args.chunks > 1:
        strided = [int(v) for v in
                   np.array_split(np.asarray(strided, np.int64),
                                  args.chunks)[args.num_chunk]]

    if args.adaptive != "off" and args.adaptive_group > 1:
        if args.adaptive_engine != "device":
            raise SystemExit("--adaptive-group > 1 requires "
                             "--adaptive-engine device")
        if smoothed_native is not None:
            raise SystemExit("--adaptive-group is incompatible with "
                             "--cascade")
        eligible = [i for i in strided if i not in done]
        group = args.adaptive_group
        for g0 in range(0, len(eligible), group):
            ids = eligible[g0:g0 + group]
            before = time()
            results = smoothed.certify_adaptive_many(
                [dataset[i] for i in ids], [x] * len(ids), ids,
                args.N0, args.N, args.alpha,
                [jax.random.fold_in(key, i) for i in ids],
                mode=args.adaptive,
                chunk_batches=args.adaptive_chunk_batches,
                slack=args.adaptive_slack,
                gap_target=args.adaptive_gap_target, pad_to=group)
            # The TSV time column reports per-identity wall-clock; inside
            # a group that is the dispatch time split evenly.
            per_id = (time() - before) / len(ids)
            for i, (prediction, gap, n_used) in zip(ids, results):
                print(f"adaptive[{args.adaptive}] id {i}: "
                      f"{n_used}/{args.N0 + args.N} samples")
                elapsed = str(datetime.timedelta(seconds=per_id))
                correct = int(prediction == i)
                radius = float(np.min(sigma)) * gap
                if is_writer:
                    with open(args.outfile, "a") as f:
                        print(f"{i}\t{i}\t{prediction}\t{correct}\t"
                              f"{gap:.3}\t{radius:.3}\t{elapsed}", file=f,
                              flush=True)
        return

    for i in strided:
        if i in done:
            continue
        z = dataset[i]
        before = time()
        key_i = jax.random.fold_in(key, i)
        # Cascade key discipline: the fast pass uses a DERIVED key so its
        # outcome (the selection event) is independent of the native pass's
        # noise — otherwise the Clopper-Pearson bound of the re-run would be
        # conditioned on a correlated event. The native pass uses exactly
        # the key a plain native run would (fold_in(key, i)), so every
        # cascade-emitted certification is bit-identical to that run's row
        # (tests/test_cli.py::test_certify_cascade asserts this).
        k_fast = (jax.random.fold_in(key_i, 1)
                  if smoothed_native is not None else key_i)

        def run_certify(sm, k):
            if args.adaptive == "off":
                return sm.certify(z, x, i, args.N0, args.N, args.alpha, k)
            pred, gap, n_used = sm.certify_adaptive(
                z, x, i, args.N0, args.N, args.alpha, k,
                mode=args.adaptive,
                chunk_batches=args.adaptive_chunk_batches,
                slack=args.adaptive_slack,
                gap_target=args.adaptive_gap_target,
                engine=args.adaptive_engine)
            print(f"adaptive[{args.adaptive}] id {i}: "
                  f"{n_used}/{args.N0 + args.N} samples")
            return pred, gap

        prediction, gap = run_certify(smoothed, k_fast)
        if smoothed_native is not None and prediction == i:
            prediction, gap = run_certify(smoothed_native, key_i)
        elapsed = str(datetime.timedelta(seconds=time() - before))
        correct = int(prediction == i)
        radius = float(np.min(sigma)) * gap
        if is_writer:
            with open(args.outfile, "a") as f:
                print(f"{i}\t{i}\t{prediction}\t{correct}\t{gap:.3}\t"
                      f"{radius:.3}\t{elapsed}", file=f, flush=True)


if __name__ == "__main__":
    main()
