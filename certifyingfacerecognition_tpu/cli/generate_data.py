"""Identity-generation CLI: sample latent codes and synthesize face images.

Surface mirror of /root/reference/generate_data.py: samples N latent codes
in Z/W/WP space, synthesizes images, writes ``ims/%06d.png`` plus
``z.npy``/``w.npy``/``wp.npy`` arrays. Default seed 2 matches the
reference (generate_data.py:26-27). PNGs are written RGB via PIL (the
reference's channel flip at generate_data.py:110 is a cv2-BGR artifact,
not a content difference).

TPU-native: synthesis runs in real jitted batches (--batch-size, default
16) instead of the reference's device micro-batch of 4
(models/model_settings.py:72).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (STYLEGAN_TRUNCATION_LAYERS, STYLEGAN_TRUNCATION_PSI)
from ..utils import weights as W
from ..utils.logger import setup_logger

MODEL_POOL = {
    "stylegan_ffhq": {"resolution": 1024, "gan_type": "stylegan"},
    "stylegan_celebahq": {"resolution": 1024, "gan_type": "stylegan"},
    "pggan_celebahq": {"resolution": 1024, "gan_type": "pggan"},
}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Generate images with given model.")
    parser.add_argument("-m", "--model_name", type=str, required=True,
                        choices=list(MODEL_POOL),
                        help="Name of the model for generation. (required)")
    parser.add_argument("-o", "--output_dir", type=str, required=True,
                        help="Directory to save the output results. (required)")
    parser.add_argument("-i", "--latent_codes_path", type=str, default="",
                        help="If specified, load latent codes instead of "
                             "sampling. (optional)")
    parser.add_argument("-n", "--num", type=int, default=1,
                        help="Number of images to generate. (default: 1)")
    parser.add_argument("-s", "--latent_space_type", type=str, default="z",
                        choices=["z", "Z", "w", "W", "wp", "wP", "Wp", "WP"],
                        help="Latent space used in Style GAN. (default: Z)")
    parser.add_argument("-I", "--generate_image", action="store_false",
                        help="If specified, skip generating images.")
    # ---- TPU-framework additions ----
    parser.add_argument("--weights", type=str, default="random",
                        help=".npz/.pth generator weights or 'random[:seed]'")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=2,
                        help="Sampling seed (reference default: 2)")
    parser.add_argument("--dtype", type=str, default="fp32",
                        choices=["fp32", "bf16"])
    parser.add_argument("--resolution", type=int, default=None,
                        help="Override synthesis resolution (debug/smoke)")
    return parser


def main(argv=None) -> None:
    from ..models import pggan, stylegan

    args = build_parser().parse_args(argv)
    settings = MODEL_POOL[args.model_name]
    resolution = args.resolution or settings["resolution"]
    gan_type = settings["gan_type"]
    space = args.latent_space_type.lower()
    if gan_type == "pggan":
        assert space == "z", "PGGAN only supports Z space"

    logger = setup_logger(args.output_dir, logger_name="generate_data",
                          allow_existing=True)
    logger.info(f"Initializing {args.model_name} generator.")
    params = W.load_generator_params(args.weights, args.model_name,
                                     resolution=resolution)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if (resolution >= 512 and dtype == jnp.float32
            and args.batch_size > 8 and args.generate_image):
        # XLA lays small-channel conv activations out batch-minor (padded
        # to 128 lanes); at f32/1024^2 a batch-20 forward already exceeds
        # 16 GB HBM. The reference capped its generator micro-batch at 4
        # for the same class of reason (model_settings.py:72).
        logger.warning(
            f"batch {args.batch_size} at {resolution}^2 in fp32 can exceed "
            "16 GB HBM (batch-minor lane padding); if this OOMs use "
            "--batch-size 8 or --dtype bf16")

    os.makedirs(osp.join(args.output_dir, "ims"), exist_ok=True)

    # ---- latent codes ----
    rng = np.random.default_rng(args.seed)
    if args.latent_codes_path and osp.isfile(args.latent_codes_path):
        logger.info(f"Preparing latent codes from {args.latent_codes_path}")
        codes = np.load(args.latent_codes_path).astype(np.float32)
        num = codes.shape[0]
        if gan_type == "pggan":
            # loaded Z codes are preprocessed to the sqrt(512) sphere before
            # use AND saving, like the reference (generate_data.py:86-87).
            codes = np.asarray(pggan.preprocess_z(jnp.asarray(codes)))
    else:
        logger.info(f"Sampling {args.num} latent codes randomly.")
        num = args.num
        if space == "wp" and gan_type == "stylegan":
            # WP codes are per-layer (mod_stylegan_generator.py:153-155).
            L = stylegan.num_layers(resolution)
            codes = rng.standard_normal((num, L, 512)).astype(np.float32)
        else:
            codes = rng.standard_normal((num, 512)).astype(np.float32)
        if gan_type == "pggan":
            codes = np.asarray(pggan.preprocess_z(jnp.asarray(codes)))
    if space == "wp" and gan_type == "stylegan":
        codes = codes.reshape(num, -1, 512)

    # ---- jitted synthesis programs ----
    if gan_type == "stylegan":
        mapping = jax.jit(lambda p, z: stylegan.mapping_apply(p, z))
        trunc = jax.jit(lambda p, w: stylegan.truncation_apply(
            p, w, resolution=resolution,
            truncation_psi=STYLEGAN_TRUNCATION_PSI,
            truncation_layers=STYLEGAN_TRUNCATION_LAYERS))
        synth_wp = jax.jit(lambda p, wp: stylegan.postprocess(
            stylegan.synthesis_apply(p, wp, resolution=resolution,
                                     dtype=dtype)))
    else:
        synth_z = jax.jit(lambda p, z: pggan.synthesize_from_z(
            p, z, resolution=resolution, dtype=dtype))

    results = {}
    images = []
    bs = args.batch_size
    t0 = time()
    for s in range(0, num, bs):
        batch = jnp.asarray(codes[s:s + bs])
        if gan_type == "pggan":
            # PGGAN always synthesizes+saves images — the reference's
            # easy_synthesize ignores generate_image for PGGAN.
            img = synth_z(params, batch)
            results.setdefault("z", []).append(np.asarray(batch))
        elif space == "wp":
            # WP inputs are final per-layer codes — used directly, NO
            # truncation (mod_stylegan_generator.py:258-270).
            wp = batch
            results.setdefault("wp", []).append(np.asarray(wp))
            img = synth_wp(params, wp) if args.generate_image else None
        else:
            if space == "z":
                # Z codes live on the sqrt(512) sphere for BOTH GANs
                # (mod_stylegan_generator.py:179-182, pggan_generator.py:104-111).
                z = batch / jnp.linalg.norm(batch, axis=1, keepdims=True) \
                    * np.sqrt(512.0)
                w = mapping(params, z)
                results.setdefault("z", []).append(np.asarray(z))
            else:
                w = batch
            wp = trunc(params, w)
            results.setdefault("w", []).append(np.asarray(w))
            results.setdefault("wp", []).append(np.asarray(wp))
            img = synth_wp(params, wp) if args.generate_image else None
        if args.generate_image or gan_type == "pggan":
            images.append(np.asarray(img))
        logger.info(f"  synthesized {min(s + bs, num)}/{num}")

    # ---- save artifacts (generate_data.py:101-123) ----
    if args.generate_image or gan_type == "pggan":
        from PIL import Image

        images = np.concatenate(images)[:num]
        for i, im in enumerate(images):
            arr = (np.clip(im, 0.0, 1.0) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                osp.join(args.output_dir, "ims", f"{i:06d}.png"))
    for space_name, arrs in results.items():
        arr = np.concatenate(arrs)[:num]
        np.save(osp.join(args.output_dir, f"{space_name}.npy"), arr)
        logger.info(f"Saved {space_name}.npy {arr.shape}")
    logger.info(f"Done in {time() - t0:3.1f}s")


if __name__ == "__main__":
    main()
