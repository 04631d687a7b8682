"""Attack CLI: embedding precompute + per-chunk attacks + aggregation.

Drop-in surface for /root/reference/main_attack.py: the same flags
(cli/opts.py), the same artifact layout (exp_results/<out>/{results,logs,
figs}), the same three modes:

  * default              — attack the chunk given by --num-chunk;
  * --eval-files         — aggregate results_chunk*of* artifacts;
  * embeddings are computed once and cached (main_attack.py:134-191,
    200-216); accepted formats: .npz (native) and the reference's
    embs_*.pth torch pickles.

TPU-native differences: one fused jitted program per attack batch, real
batch sizes instead of the generator micro-batch of 4, weights as runtime
args, jax.random key discipline instead of global torch seeds.
"""

from __future__ import annotations

import os.path as osp
from time import time

import jax.numpy as jnp
import numpy as np

from ..constants import EMB_SIZE
from ..eval.chunk_runner import (_make_attack_step, eval_chunk,
                                 eval_files, make_dists_fn,
                                 make_predict_fn)
from ..models.pipeline import FacePipeline
from ..ops import geometry as G
from ..utils import weights as W
from . import opts


def get_latent_codes(data_dir: str, n: int = None) -> np.ndarray:
    """Load the w.npy latent array (gen_utils.py:44-46)."""
    lats = np.load(osp.join(data_dir, "w.npy")).astype(np.float32)
    return lats[:n] if n else lats


def get_embs(args, pipeline: FacePipeline, lat_codes: np.ndarray
             ) -> np.ndarray:
    """Load cached gallery embeddings or compute+cache them
    (main_attack.py:134-216)."""
    log = args.LOGGER
    # Reduced-resolution embeddings are NOT interchangeable with native
    # ones; qualify the default cache name so --synthesis-resolution runs
    # never silently reuse (or poison) the native cache. An explicit
    # --embs-file is the user's responsibility.
    sr = (f"_sr{args.synthesis_resolution}"
          if args.synthesis_resolution else "")
    embs_file = args.embs_file or osp.join(
        args.data_dir, f"embs_{args.face_recog_method}{sr}.npz")
    if args.load_embs:
        log.info(f"Loading embeddings from {embs_file}")
        embs = W.load_embeddings(embs_file)[: args.load_n_embs]
    else:
        log.info(f"Computing embeddings for {len(lat_codes)} identities")
        t0 = time()
        embs = np.asarray(
            pipeline.lat2embs(jnp.asarray(lat_codes),
                              chunk=max(args.batch_size, 32)))
        log.info(f"Embeddings done in {time() - t0:3.1f}s; "
                 f"caching to {embs_file}")
        np.savez(embs_file, embs=embs)
    assert embs.ndim == 2 and embs.shape[1] == EMB_SIZE, embs.shape
    assert len(embs) == len(lat_codes), \
        f"{len(embs)} embeddings vs {len(lat_codes)} latents"
    return embs


def main(argv=None) -> None:
    args = opts.parse_args(argv)
    log = args.LOGGER
    t0 = time()

    if args.multihost:
        # Before anything touches jax.devices(): afterwards --mesh shards
        # the attack batch over the whole slice (ICI+DCN).
        import jax

        from ..parallel.mesh import init_distributed

        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
        log.info(f"multihost: process {jax.process_index()} of "
                 f"{jax.process_count()}, {len(jax.devices())} global "
                 "devices")

    region = G.get_all_matrices(args.attrs2drop,
                                scale_factor=args.scale_factor,
                                boundaries_dir=args.boundaries_dir)

    if args.eval_files:
        eval_files(args)
        log.info(f"Total time: {time() - t0:3.1f}s")
        return

    lat_codes = get_latent_codes(args.data_dir, args.load_n_embs)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    gen_params = W.load_generator_params(args.gen_weights,
                                         resolution=args.resolution)
    frm_params = W.load_frm_params(args.frm_weights, args.face_recog_method)
    syn_res = args.synthesis_resolution or args.resolution
    pipeline = FacePipeline(gen_params, frm_params, dirs=region.dirs.T,
                            frs_method=args.face_recog_method,
                            resolution=syn_res, dtype=dtype)
    embs = get_embs(args, pipeline, lat_codes)
    pipeline.gallery = jnp.asarray(embs)

    params = {"gen": gen_params, "frm": frm_params,
              "gallery": pipeline.gallery}
    # Without --num-chunk the reference evaluates EVERY chunk sequentially
    # (main_attack.py:221-229); a single chunk index runs just that one.
    chunks_to_run = ([args.num_chunk] if args.num_chunk is not None
                     else range(args.chunks))
    dists_fn = make_dists_fn(args.face_recog_method, syn_res, dtype)
    # Build the jitted programs ONCE — per-chunk jit wrappers would
    # recompile the full attack graph for every chunk.
    attack_step = _make_attack_step(dists_fn, region, args)
    predict_fn = make_predict_fn(args.face_recog_method, syn_res, dtype)

    def run_chunks():
        for num_chunk in chunks_to_run:
            log_file = eval_chunk(params, lat_codes, num_chunk, args,
                                  region=region, dists_fn=dists_fn,
                                  attack_step=attack_step,
                                  predict_fn=predict_fn)
            log.info(f"Chunk log at {log_file}")
        if args.num_chunk is None:
            # All-chunks mode aggregates at the end, like the reference
            # (main_attack.py:221-228).
            eval_files(args)

    if args.profile_dir:
        from ..utils.profiling import trace

        with trace(args.profile_dir):
            run_chunks()
    else:
        run_chunks()
    log.info(f"Total time: {time() - t0:3.1f}s")


if __name__ == "__main__":
    main()
