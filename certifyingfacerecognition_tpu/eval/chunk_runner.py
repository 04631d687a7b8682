"""Attack workload driver: per-chunk attack loop + offline aggregation.

TPU-native re-design of ``eval_chunk``/``eval_files``
(/root/reference/attack_utils/gen_utils.py:634-752,440-604):

  * the reference iterates generator micro-batches of 4 with host-side
    optimisation steps; here the whole attack for a batch of identities is
    one jitted program (restarts x iters inside lax.scan) with model weights
    threaded as runtime args (never baked into the HLO);
  * per-batch derived seeds follow the reference's discipline
    (seed + num_chunk * chunk_length + idx, gen_utils.py:656) via
    jax.random.fold_in, so chunks are reproducible and independent;
  * successful adversaries are re-verified from scratch — the deltas are
    re-applied, re-synthesised and re-classified; mismatches are demoted
    with a warning (check_advs semantics, gen_utils.py:396-410);
  * artifacts (results_chunk{K}of{N} logs/npz, 3-panel adversary figures)
    keep the reference's formats so its offline tooling still works.
"""

from __future__ import annotations

import os.path as osp
from functools import partial
from time import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.autoattack import find_adversaries_autoattack
from ..attacks.pgd import find_adversaries_pgd
from ..constants import ATTRS
from ..models.pipeline import make_lat2embs
from ..ops import distances as D
from ..ops import geometry as G
from . import artifacts, ranking


def make_dists_fn(frs_method: str, resolution: int, dtype=jnp.float32,
                  remat: bool = True) -> Callable:
    """dists(params, w [B,512]) -> [B, N] differentiable gallery distances.
    params = {gen, frm, gallery}; weights travel as runtime arguments.

    ``remat`` rematerialises the generator+FRM forward in the backward
    pass (jax.checkpoint): storing every 1024^2 synthesis activation for
    the gradient OOMs 16 GB HBM already at batch 20; recomputing trades
    one extra forward for O(batch) instead of O(batch x depth) memory."""
    embed = make_lat2embs(frs_method, resolution, dtype=dtype)

    def dists(params, w):
        embs = embed(params["gen"], params["frm"], w).astype(jnp.float32)
        return D.cdist(embs, params["gallery"], frs_method)

    return jax.checkpoint(dists) if remat else dists


def make_predict_fn(frs_method: str, resolution: int, dtype=jnp.float32
                    ) -> Callable:
    """Jitted exact identity prediction predict(params, w) -> [B] ints.

    Decisions use the exact-refined argmin (donot_use_mm-grade parity,
    ops.distances.nearest_refined) — the matmul-expansion argmin can flip
    near ties, exactly where adversaries land."""
    embed = make_lat2embs(frs_method, resolution, dtype=dtype)

    @jax.jit
    def predict(params, w):
        embs = embed(params["gen"], params["frm"], w).astype(jnp.float32)
        return D.argmin_dist_refined(embs, params["gallery"], frs_method)

    return predict


def _make_attack_step(dists_fn: Callable, region: G.RegionMatrices, args
                      ) -> Callable:
    """One jitted attack program over a batch of identities; with
    args.mesh the batch axis is sharded over all local devices (data
    parallelism — the attacks are per-sample optimisations, so XLA
    partitions them with no cross-sample collectives)."""

    if args.attack_type in ("autoattack", "autoattack-rand",
                            "autoattack-plus"):
        # Sequential multi-attack evaluation (run_standard_evaluation,
        # autoattack/autoattack.py:93-238): host loop over attacks with
        # robust-flag accumulation; each attack program is jitted once by
        # the factory, so this composes with the per-batch loop without
        # retracing. In mesh mode the batch inputs are committed to a
        # row sharding and the inner jits follow it (data parallelism).
        from ..attacks.autoattack import (AttackResult,
                                          make_standard_evaluation)

        version = args.attack_type.partition("-")[2] or "standard"
        run_eval = make_standard_evaluation(
            dists_fn, region, version=version,
            square_queries=getattr(args, "square_queries", 5000),
            preset_iters=getattr(args, "autoattack_iters", 100),
            logger=getattr(args, "LOGGER", None),
            run_checks=getattr(args, "run_checks", False))

        shard = None
        if getattr(args, "mesh", False):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import MC_AXIS, get_mesh

            n_all = len(jax.devices())
            n_dev = n_all
            bs = getattr(args, "batch_size", n_dev)
            while bs % n_dev:
                n_dev -= 1
            if n_dev != n_all:
                # Same contract as the plain --mesh attack path below:
                # never shrink the mesh silently.
                print(f"WARNING: --batch-size {bs} does not divide the "
                      f"{n_all}-device count; autoattack mesh reduced to "
                      f"{n_dev} device(s) — pick a batch size divisible by "
                      f"{n_all} to use the full mesh")
            mesh = get_mesh(MC_AXIS, n_devices=n_dev)
            shard = NamedSharding(mesh, P(MC_AXIS))

        def step(params, lats, labels, key):
            if shard is not None:
                lats = jax.device_put(lats, shard)
                labels = jax.device_put(labels, shard)
            res = run_eval(params, lats, labels, key)
            return AttackResult(res.deltas, res.success, res.magnitudes)

        return step

    if args.attack_type == "manual":
        def step(params, lats, labels, key):
            return find_adversaries_pgd(
                partial(dists_fn, params), lats, labels, key, region,
                opt_name=args.optim, lr=args.lr, iters=args.iters,
                momentum=args.momentum, loss_type=args.loss,
                lin_comb=args.lin_comb, random_init=True,
                rand_init_on_surf=not args.not_on_surf,
                restarts=args.restarts)
    else:
        def step(params, lats, labels, key):
            return find_adversaries_autoattack(
                partial(dists_fn, params), lats, labels, key, region,
                args.attack_type, iters=args.iters, restarts=args.restarts,
                n_target_classes=args.n_target_classes,
                apgd_use_cli_iters=getattr(args, "apgd_use_cli_iters",
                                           False))

    if not getattr(args, "mesh", False):
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import MC_AXIS, get_mesh

    # Largest device count that divides the batch.
    n_all = len(jax.devices())
    n_dev = n_all
    bs = getattr(args, "batch_size", n_dev)
    while bs % n_dev:
        n_dev -= 1
    if n_dev != n_all:
        # Match the plain --mesh attack path's documented contract instead
        # of silently shrinking (e.g. batch 6 on 8 devices quietly ran on
        # 3 of them).
        print(f"WARNING: --batch-size {bs} does not divide the "
              f"{n_all}-device count; attack mesh reduced to {n_dev} "
              f"device(s) — pick a batch size divisible by {n_all} to use "
              "the full mesh")
    mesh = get_mesh(MC_AXIS, n_devices=n_dev)
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(MC_AXIS))
    return jax.jit(step, in_shardings=(repl, row, row, repl),
                   out_shardings=row)


def eval_chunk(params: Dict, lat_codes: np.ndarray, num_chunk: int, args,
               region: Optional[G.RegionMatrices] = None,
               dists_fn: Optional[Callable] = None,
               attack_step: Optional[Callable] = None,
               predict_fn: Optional[Callable] = None) -> str:
    """Attack one chunk of identities; writes log + data artifacts and
    returns the log-file path (gen_utils.py:634-752).

    Pass ``attack_step``/``predict_fn`` when running many chunks — a fresh
    jit wrapper per chunk would recompile the full attack program (minutes
    on TPU) for identical shapes."""
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if region is None:
        region = G.get_all_matrices(args.attrs2drop,
                                    scale_factor=args.scale_factor,
                                    boundaries_dir=args.boundaries_dir)
    if dists_fn is None:
        dists_fn = make_dists_fn(args.face_recog_method, args.resolution,
                                 dtype)
    if predict_fn is None:
        predict_fn = make_predict_fn(args.face_recog_method, args.resolution,
                                     dtype)

    start_time = time()
    log = args.LOGGER
    log.info(f"Processing chunk {num_chunk} out of {args.chunks}")
    chunk_length = len(lat_codes) / args.chunks
    assert chunk_length == int(chunk_length), \
        "Partition of set should be exact"
    chunk_length = int(chunk_length)
    bs = min(args.batch_size, chunk_length)
    assert chunk_length % bs == 0, \
        f"Batch size MUST divide chunk length: {chunk_length} vs {bs}"

    start = num_chunk * chunk_length
    chunk_lats = np.asarray(lat_codes[start:start + chunk_length], np.float32)

    if attack_step is None:
        attack_step = _make_attack_step(dists_fn, region, args)
    base_key = jax.random.PRNGKey(args.seed)

    if getattr(args, "run_checks", False):
        # Pre-attack defense sanity checks on the first batch, mirroring
        # run_standard_evaluation's check battery (autoattack.py:99-105).
        from ..attacks.checks import run_all_checks

        first = jnp.asarray(chunk_lats[:bs])
        labels0 = jnp.arange(start, start + first.shape[0])

        @jax.jit
        def logits0(p):
            pert = jnp.dot(p, region.dirs.T)
            return -dists_fn(params, first + pert)

        from ..attacks.losses import compute_loss

        zeros = jnp.zeros((first.shape[0], region.dirs.shape[1]),
                          jnp.float32)
        grad_fn = jax.jit(jax.grad(lambda p: compute_loss(
            -logits0(p), labels0, loss_type="xent")))
        run_all_checks(logits0, zeros, labels0, grad_fn=grad_fn, logger=log)

    deltas, successes, magnitudes, all_labels = [], [], [], []
    tot = 0
    for idx in range(0, chunk_length, bs):
        batch = jnp.asarray(chunk_lats[idx:idx + bs])
        labels = jnp.arange(start + idx, start + idx + batch.shape[0])
        # Reference seed discipline: seed + chunk*len + batch index
        # (gen_utils.py:656), realised as a fold_in of the same integer.
        key = jax.random.fold_in(
            base_key, num_chunk * chunk_length + idx // bs)
        res = attack_step(params, batch, labels, key)
        deltas.append(np.asarray(res[0], np.float32))
        successes.append(np.asarray(res[1], bool))
        magnitudes.append(np.asarray(res[2], np.float32))
        all_labels.append(np.asarray(labels))
        tot += batch.shape[0]
        mags = np.concatenate(magnitudes)
        succ = np.concatenate(successes)
        avg = float(np.sqrt(mags[succ]).mean()) if succ.any() else 0.0
        log.info(f"-> {int(succ.sum())} advs for {tot} IDs "
                 f"-> avg. pert.: {avg:3.4f}")

    deltas = np.concatenate(deltas)
    successes = np.concatenate(successes)
    magnitudes = np.concatenate(magnitudes)
    all_labels = np.concatenate(all_labels)
    log.info(f"Finished chunk computation. Time={time() - start_time:3.2f}s")

    n_succ = int(successes.sum())
    lin_comb = args.lin_comb or args.attack_type != "manual"
    if n_succ and args.attack_type not in ("fab-t", "fab", "autoattack",
                                           "autoattack-rand",
                                           "autoattack-plus"):
        # (autoattack's kept deltas may come from its fab-t stage, which is
        # minimum-norm and may legitimately exceed the budget.)
        # Host-side feasibility check for the bounded attacks (check_deltas
        # with check=True, gen_utils.py:316-331); FAB is minimum-norm and
        # may legitimately exceed the budget.
        from ..attacks.pgd import assert_deltas_feasible

        assert_deltas_feasible(jnp.asarray(deltas[successes]), region,
                               lin_comb=lin_comb)

    avg_pert = 0.0
    if n_succ == 0:
        log.info("Didnt find any adversary! =(")
    else:
        # Re-verify the adversaries from scratch (gen_utils.py:714-741) in
        # attack-sized batches (one forward over every success would OOM
        # for large chunks), padded to a fixed batch so the jitted exact
        # predictor compiles once.
        succ_idx = np.nonzero(successes)[0]
        succ_deltas = np.asarray(deltas[succ_idx])
        succ_lats = chunk_lats[succ_idx]
        if lin_comb:
            pert = succ_deltas @ np.asarray(region.dirs).T
        else:
            pert = succ_deltas
        adv_lats = succ_lats + pert.astype(np.float32)
        preds_parts = []
        for s in range(0, len(adv_lats), bs):
            batch_lats = adv_lats[s:s + bs]
            n_valid = len(batch_lats)
            if n_valid < bs:
                batch_lats = np.concatenate(
                    [batch_lats, np.zeros((bs - n_valid, batch_lats.shape[1]),
                                          np.float32)])
            p = predict_fn(params, jnp.asarray(batch_lats))
            preds_parts.append(np.asarray(p)[:n_valid])
        curr_preds = np.concatenate(preds_parts)
        curr_labels = all_labels[succ_idx]
        where_adv = curr_preds != curr_labels
        if not where_adv.all():
            log.info(f"Some ({int((~where_adv).sum())}) supposed "
                     "adversaries were NOT adversaries")
        successes[succ_idx] = where_adv
        n_succ = int(successes.sum())
        if n_succ == 0:
            log.info("Didnt find any adversary! =(")
        else:
            avg_pert = float(np.sqrt(magnitudes[successes]).mean())
            log.info(f"-> Found {n_succ} advs for {tot} IDs "
                     f"-> avg. pert.: {avg_pert:3.4f}")
            _plot_advs(params, chunk_lats, deltas, successes, all_labels,
                       curr_preds[where_adv], lat_codes, region, args)

    results = {
        "successes": n_succ,
        "instances": len(all_labels),
        "avg_mags": avg_pert if n_succ != 0 else 0,
    }
    log_file, _ = artifacts.save_chunk_results(
        results, deltas, successes, magnitudes, num_chunk, args.chunks,
        args.results_dir, args.logs_dir)
    return log_file


def _plot_advs(params, chunk_lats, deltas, successes, all_labels, adv_preds,
               lat_codes, region, args, max_figs: int = 16) -> None:
    """3-panel original | adversary | confused-with figures
    (gen_utils.py:755-774), written with PIL instead of matplotlib."""
    try:
        from PIL import Image
    except ImportError:
        return
    from ..models import stylegan

    succ_idx = np.nonzero(successes)[0][:max_figs]
    if succ_idx.size == 0:
        return
    adv_preds = adv_preds[:max_figs]
    lats = jnp.asarray(chunk_lats[succ_idx])
    d = jnp.asarray(deltas[succ_idx])
    lin_comb = args.lin_comb or args.attack_type != "manual"
    pert = jnp.dot(d, region.dirs.T) if lin_comb else d
    conf_lats = jnp.asarray(np.asarray(lat_codes)[adv_preds], jnp.float32)

    synth = jax.jit(lambda gp, w: stylegan.synthesize_from_w(
        gp, w, resolution=args.resolution))

    def synth_chunked(w, bs=4):
        # Figures only — tiny fixed batches keep this off the HBM peak
        # (one f32 1024^2 batch of 16 costs 8 GB once XLA pads the batch
        # into the lane dim).
        outs = []
        for s in range(0, w.shape[0], bs):
            b = w[s:s + bs]
            if b.shape[0] < bs:
                b = jnp.concatenate(
                    [b, jnp.zeros((bs - b.shape[0],) + b.shape[1:],
                                  b.dtype)])
                outs.append(np.asarray(synth(params["gen"], b))
                            [: w.shape[0] - s])
            else:
                outs.append(np.asarray(synth(params["gen"], b)))
        return np.concatenate(outs)

    ims = synth_chunked(lats)
    adv_ims = synth_chunked(lats + pert)
    conf_ims = synth_chunked(conf_lats)

    for j, i in enumerate(succ_idx):
        panel = np.concatenate([ims[j], adv_ims[j], conf_ims[j]], axis=1)
        panel = (np.clip(panel, 0, 1) * 255).astype(np.uint8)
        label, pred = int(all_labels[i]), int(adv_preds[j])
        Image.fromarray(panel).save(
            osp.join(args.figs_dir, f"ori_{label}_adv_{pred}.jpg"))


def eval_files(args, epsilons: Optional[np.ndarray] = None) -> None:
    """Aggregate chunk artifacts into results.txt + attribute ranking +
    acc-vs-budget curve (gen_utils.py:440-604)."""
    log_files, data_files = artifacts.find_chunk_files(args.results_dir,
                                                       args.logs_dir)
    assert log_files, f"no chunk logs found under {args.logs_dir}"
    agg = ranking.aggregate_results(
        [artifacts.parse_chunk_log(f) for f in log_files])
    args.LOGGER.info(
        f"Total. Successes: {agg['successes']} -- "
        f"Instances: {agg['instances']} -- Rate: {agg['rate']:.2f}% -- "
        f"Avg.Mag.: {agg['avg_mag']:.4f}")
    # results.txt schema matches gen_utils.py:545-549 field-for-field.
    lines = [f"successes:{agg['successes']}",
             f"instances:{agg['instances']}",
             f"rate:{agg['rate']:4.2f}",
             f"avg_mag:{agg['avg_mag']:4.2f}"]

    if data_files:
        all_deltas = np.concatenate(
            [artifacts.load_chunk_data(f)["deltas"] for f in data_files])
        all_mags = np.concatenate(
            [artifacts.load_chunk_data(f)["magnitudes"] for f in data_files])
        # Zero-magnitude "successes" (initially-misclassified samples keep
        # the clean delta) carry no attribute signal and would NaN the
        # normalised components.
        nz = all_mags > 1e-12
        if not nz.all():
            args.LOGGER.info(f"Dropping {int((~nz).sum())} zero-magnitude "
                             "deltas from the ranking")
        all_deltas, all_mags = all_deltas[nz], all_mags[nz]
        attr_names = [a for a in ATTRS if a not in set(args.attrs2drop)]
        if epsilons is None:
            # red_ellipse_diag = scale_factor / eps^2, i.e. the effective
            # semi-axes are eps / sqrt(scale_factor) — NOT eps * scale.
            epsilons = np.array([ATTRS[a] for a in attr_names]) \
                / np.sqrt(args.scale_factor)
        _, norm_comps = ranking.delta_components(all_deltas, all_mags,
                                                 epsilons)
        failed, order, pvals = ranking.get_ranking(norm_comps, attr_names)
        if failed:
            args.LOGGER.info("Attribute ranking failed (Friedman test "
                             "not significant)")
            lines.append("importance-order:failed")
        else:
            args.LOGGER.info(f"Importance ranking: {order} (pvals {pvals})")
            # '>'-joined order and {:3.2E} pvals (gen_utils.py:569-577).
            lines.append("importance-order:" + ">".join(order))
            lines.append("order-pvals:" +
                         ">".join(f"{p:3.2E}" for p in pvals))
        _plot_acc_vs_budget(all_mags, agg["instances"], args)

    from ..utils.logger import print_to_log

    for line in lines:
        print_to_log(line, args.final_results)


def _plot_acc_vs_budget(magnitudes: np.ndarray, tot_instances: int, args
                        ) -> None:
    # accuracy_vs_budget already returns the reference's accuracy curve
    # (#{||delta|| > t}/instances, non-increasing in t — gen_utils.py:
    # 586-597); plotting its complement inverts the robustness conclusion.
    lins, acc = ranking.accuracy_vs_budget(magnitudes, tot_instances)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        np.savez(osp.join(args.figs_dir, "acc_vs_pert.npz"),
                 budget=lins, accuracy=acc)
        return
    fig, ax = plt.subplots()
    ax.plot(lins, 100.0 * acc)
    ax.set_xlabel(r"Perturbation budget ($\Sigma$-norm)")
    ax.set_ylabel("Accuracy [%]")
    ax.grid(True, alpha=0.3)
    fig.savefig(osp.join(args.figs_dir, "acc_vs_pert.png"),
                bbox_inches="tight", dpi=120)
    plt.close(fig)
