"""Attack CLI flag surface, mirroring /root/reference/attack_utils/opts.py:11-98.

All reference flags are preserved (names, defaults, semantics); new
TPU-framework flags are additive and documented as such:

  * --gen-weights / --frm-weights: weight sources (.npz native, .pth torch
    checkpoints converted+cached on first use, or 'random[:seed]' for
    benchmarks) — the reference hardcodes these paths
    (models/model_settings.py:48-61, main_attack.py:43).
  * --data-dir: latent-code directory holding w.npy (gen_utils.py:20-24).
  * --batch-size: attack batch per device step (the reference is pinned to
    the generator micro-batch of 4, model_settings.py:72; TPUs want real
    batches).
  * --boundaries-dir: where the InterFaceGAN boundary .npy files live.
  * --dtype: bf16|fp32 compute for the fused generator+FRM program.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

from ..constants import ATTACKS, ATTRS, FRS_METHODS, LOSS_TYPES, OPTIMS
from ..utils.logger import args2text, print_to_log, setup_logger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Compute semantic adversaries (TPU-native)")
    # Optimization parameters (opts.py:13-30)
    parser.add_argument("--lr", type=float, default=1e2, help="Learning rate")
    parser.add_argument("--momentum", type=float, default=0.9,
                        help="Momentum for SGD")
    parser.add_argument("--loss", type=str, default="xent", choices=LOSS_TYPES,
                        help="Loss to optimize")
    parser.add_argument("--optim", type=str, default="SGD", choices=OPTIMS,
                        help="Optimizer to use")
    parser.add_argument("--no-lin-comb", action="store_true", default=False,
                        help="Compute adv NOT as lin. comb. of directions")
    parser.add_argument("--attack-type", type=str, default="manual",
                        choices=ATTACKS, help="Attack to perform")
    parser.add_argument("--iters", type=int, default=10,
                        help="Optimization iterations per instance")
    parser.add_argument("--restarts", type=int, default=10,
                        help="Random restarts per instance")
    parser.add_argument("--n-target-classes", type=int, default=10,
                        help="num of classes for targetted attacks")
    # Attribute manipulation (opts.py:32-37)
    parser.add_argument("--attrs2drop", nargs="+", default=[],
                        choices=list(ATTRS.keys()),
                        help="List of attributes to NOT consider for attacks")
    parser.add_argument("--scale-factor", type=float, default=1.0,
                        help="Factor for scaling Sigma")
    # Initialization (opts.py:39-41)
    parser.add_argument("--not-on-surf", action="store_true", default=False,
                        help="Random initialization is NOT on region surface")
    # Logging (opts.py:43-45)
    parser.add_argument("--output-dir", type=str, required=True,
                        help="Directory to save the output results (required)")
    # System to attack (opts.py:47-50)
    parser.add_argument("--face-recog-method", type=str, default="insightface",
                        choices=FRS_METHODS,
                        help="Face recognition system to use")
    # Evaluation (opts.py:52-65)
    parser.add_argument("--chunks", type=int, default=50_000,
                        help="num of chunks in which to break the dataset")
    parser.add_argument("--num-chunk", type=int, default=None,
                        help="index of chunk to evaluate on")
    parser.add_argument("--eval-files", action="store_true", default=False,
                        help="evaluate based on files at "
                             "exp_results/logs/results_chunk*of*.txt")
    parser.add_argument("--load-embs", action="store_true", default=False,
                        help="Whether to load embs from file")
    parser.add_argument("--load-n-embs", type=int, default=1_000_000,
                        help="num of embs. Default is all of them (1M)")
    parser.add_argument("--embs-file", type=str, default=None,
                        help="Load embs from this file")
    # Randomization (opts.py:67-69)
    parser.add_argument("--seed", type=int, default=0,
                        help="for deterministic behavior")
    # ---- TPU-framework additions ----
    parser.add_argument("--gen-weights", type=str, default="random",
                        help=".npz/.pth StyleGAN weights, or 'random[:seed]'")
    parser.add_argument("--frm-weights", type=str, default="random",
                        help=".npz/.pth FRM weights, or 'random[:seed]'")
    parser.add_argument("--data-dir", type=str,
                        default=os.environ.get("CFR_DATA_DIR",
                                               "data/stylegan_ffhq_1M"),
                        help="Directory with w.npy latent codes")
    parser.add_argument("--boundaries-dir", type=str, default=None,
                        help="InterFaceGAN boundary .npy directory")
    parser.add_argument("--batch-size", type=int, default=48,
                        help="Identities per device attack step (48 is the "
                             "measured backward-pass sweet spot at 1024^2 "
                             "bf16 on a 16 GB chip — docs/PERF.md; 64 "
                             "exceeds HBM)")
    parser.add_argument("--resolution", type=int, default=1024,
                        help="StyleGAN synthesis resolution")
    parser.add_argument("--synthesis-resolution", type=int, default=None,
                        help="Truncate synthesis at this resolution while "
                             "loading --resolution weights (the FRM sees a "
                             "112^2 resize either way; docs/PERF.md "
                             "'Reduced-resolution certification'). Attack "
                             "success/magnitudes then refer to the "
                             "truncated pipeline; cached embeddings must "
                             "match the same synthesis resolution.")
    parser.add_argument("--dtype", type=str, default="fp32",
                        choices=["fp32", "bf16"],
                        help="Compute dtype for the fused pipeline")
    parser.add_argument("--mesh", action="store_true", default=False,
                        help="Shard the attack batch over all local devices "
                             "(batch-size must divide the device count)")
    parser.add_argument("--autoattack-iters", type=int, default=100,
                        help="Per-attack iteration budget inside "
                             "--attack-type autoattack (set_version "
                             "default 100); lower for smoke runs")
    parser.add_argument("--square-queries", type=int, default=5000,
                        help="Square query budget inside --attack-type "
                             "autoattack (set_version default 5000)")
    parser.add_argument("--apgd-use-cli-iters", action="store_true",
                        default=False,
                        help="Honor --iters/--restarts for apgd-ce/apgd-dlr "
                             "(by default they run the reference's effective "
                             "100x1 and a warning is logged)")
    parser.add_argument("--run-checks", action="store_true", default=False,
                        help="Run defense sanity checks before attacking "
                             "(autoattack checks.py equivalents)")
    parser.add_argument("--multihost", action="store_true", default=False,
                        help="Initialise jax.distributed before building "
                             "meshes (one process per pod host); composes "
                             "with --mesh for DCN-spanning data parallelism")
    parser.add_argument("--coordinator-address", type=str, default=None,
                        help="host:port of process 0 (only needed off-TPU)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler device trace of the "
                             "chunk into this directory")
    return parser


def finalize_args(args: argparse.Namespace) -> argparse.Namespace:
    """Derived dirs/logger, mirroring opts.py:71-98."""
    args.output_dir = osp.join("exp_results", args.output_dir)
    args.lin_comb = not args.no_lin_comb

    args.results_dir = osp.join(args.output_dir, "results")
    args.logs_dir = osp.join(args.output_dir, "logs")
    args.figs_dir = osp.join(args.output_dir, "figs")
    for d in (args.output_dir, args.results_dir, args.logs_dir,
              args.figs_dir):
        os.makedirs(d, exist_ok=True)

    chunk = "all" if args.num_chunk is None else args.num_chunk
    args.info_log = osp.join(args.output_dir, f"info_chunk_{chunk}.txt")
    print_to_log(args2text(args), args.info_log)

    args.final_results = osp.join(args.output_dir, "results.txt")

    # Logger names are process-global: qualify by output dir so different
    # experiments can run from one process (the reference is one-process-
    # per-invocation and uses the bare chunk name).
    logger = setup_logger(
        osp.join(args.output_dir, f"chunk_{chunk}"),
        logger_name=f"{osp.basename(args.output_dir)}_chunk_{chunk}")
    logger.info(args2text(args))
    args.LOGGER = logger
    return args


def parse_args(argv=None) -> argparse.Namespace:
    return finalize_args(build_parser().parse_args(argv))
