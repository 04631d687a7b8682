"""The fused generator -> FRS pipeline and the smoothed base classifier.

TPU-native replacement for the reference's ``lat2embs`` host loop
(/root/reference/attack_utils/gen_utils.py:108-139 — generator micro-batches
of 4 with per-batch host sync) and ``WrappedModel``
(/root/reference/models/smoothing_model.py — which even computes the softmax
on CPU, :71). Here the whole chain

    w -> truncation -> synthesis -> [0,1] postprocess -> bilinear resize ->
    normalise -> FRS -> embeddings (-> gallery distances -> argmin/probs)

is a single jitted XLA program with a real batch dimension.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import facenet, iresnet, stylegan
from ..constants import EMB_SIZE, INP_RESOLS, MEAN, STD
from ..ops import distances as D
from ..ops.resize import transform_for_frs, transform_for_frs_cb


def frm_apply(frs_method: str, frm_params: Dict, x: jnp.ndarray, *,
              dtype=jnp.float32) -> jnp.ndarray:
    """Dispatch to the right face-recognition backbone
    (main_attack.py:121-131)."""
    if frs_method == "insightface":
        return iresnet.apply(frm_params, x, dtype=dtype)
    return facenet.apply(frm_params, x, dtype=dtype)


def make_lat2embs(frs_method: str, resolution: int, dtype=jnp.float32
                  ) -> Callable:
    """Returns embed(gen_params, frm_params, w [B,512]) -> [B,512] as one
    fused program (replaces gen_utils.py:108-139)."""
    img_size = INP_RESOLS[frs_method]
    # Consume the [3, H, W, B] channel-outer image layout all the way to
    # the 112^2/160^2 resize whenever synthesis can emit it (the Pallas
    # chain tail natively; the XLA bf16 path via its final ToRGB matmul) —
    # the NHWC full-resolution 3-channel image is the pathological TPU
    # layout (docs/PERF.md round 3).
    use_cb = stylegan.cb_out_active(resolution, dtype)

    def embed(gen_params, frm_params, w):
        img = stylegan.synthesize_from_w(gen_params, w, resolution=resolution,
                                         dtype=dtype, cb_out=use_cb)
        if use_cb:
            x = transform_for_frs_cb(img, img_size, MEAN, STD)
        else:
            x = transform_for_frs(img, img_size, MEAN, STD)
        return frm_apply(frs_method, frm_params, x, dtype=dtype)

    return embed


@dataclass
class FacePipeline:
    """Bundled generator + FRS + geometry for the attack/certify workloads.

    The smoothed-classifier surface matches WrappedModel
    (models/smoothing_model.py:12-72): ``probs(z, p)`` returns
    softmax(-cdist(emb, gallery)/sqrt(512)) and ``predict(z, p)`` its argmax
    (computed via exact-refined argmin distances instead of materialising
    the softmax).
    """

    gen_params: Dict
    frm_params: Dict
    dirs: jnp.ndarray                    # [k, 512] direction matrix (rows)
    frs_method: str = "insightface"
    resolution: int = 1024
    dtype: object = jnp.float32
    gallery: Optional[jnp.ndarray] = None  # [N, 512] identity embeddings
    embed_fn: Callable = field(init=False)

    def __post_init__(self):
        self.embed_fn = make_lat2embs(self.frs_method, self.resolution,
                                      self.dtype)
        # Params as runtime ARGUMENTS — closing over them bakes the full
        # weight pytree into the HLO as constants (overflows the
        # remote-compile upload; see make_counts_fn).
        embed_jit = jax.jit(self.embed_fn)
        self._embed_jit = lambda w: embed_jit(self.gen_params,
                                              self.frm_params, w)

    # ---- embeddings ----
    def lat2embs(self, w: jnp.ndarray, chunk: int = 0) -> jnp.ndarray:
        """Embed latent codes; optionally in fixed-size chunks (pads the
        tail) to bound device memory for large N."""
        if chunk and w.shape[0] > chunk:
            outs = []
            n = w.shape[0]
            for s in range(0, n, chunk):
                batch = w[s:s + chunk]
                if batch.shape[0] < chunk:
                    pad = chunk - batch.shape[0]
                    batch = jnp.concatenate(
                        [batch, jnp.zeros((pad, EMB_SIZE), batch.dtype)])
                    outs.append(np.asarray(self._embed_jit(batch))[:-pad])
                else:
                    outs.append(np.asarray(self._embed_jit(batch)))
            return jnp.asarray(np.concatenate(outs, axis=0))
        return self._embed_jit(w)

    # ---- classifier head over the gallery ----
    def perturb_latents(self, z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """w = z + p @ dirs (smoothing_model.py:63-68). z: [512] or [B,512];
        p: [B, k]."""
        pert = jnp.dot(p, self.dirs, precision=jax.lax.Precision.HIGHEST)
        return jnp.atleast_2d(z) + pert

    def logits(self, z, p) -> jnp.ndarray:
        """Negative distances to the gallery (gen_utils.py:248-256)."""
        w = self.perturb_latents(z, p)
        embs = self.embed_fn(self.gen_params, self.frm_params, w)
        return -D.cdist(embs, self.gallery, self.frs_method)

    def probs(self, z, p) -> jnp.ndarray:
        return D.probs_from_dists(-self.logits(z, p))

    def predict(self, z, p) -> jnp.ndarray:
        """Exact argmin-distance identity prediction [B]."""
        w = self.perturb_latents(z, p)
        embs = self.embed_fn(self.gen_params, self.frm_params, w)
        return D.argmin_dist_refined(embs, self.gallery, self.frs_method)

    def predict_fn(self) -> Callable:
        """A pure (z, p) -> preds closure for Smooth/make_counts_fn.

        NOTE: closure-captured weights are baked into the compiled program
        as constants; prefer ``predict_fn_with_params`` for real model
        sizes (see make_counts_fn's with_params contract)."""
        fn, params = self.predict_fn_with_params()
        return partial(fn, params)

    def predict_fn_with_params(self) -> Tuple[Callable, Dict]:
        """(fn, params) with fn(params, z, p) -> preds; weights/gallery/dirs
        travel as runtime arguments, keeping the compiled HLO small."""
        embed_fn, method = self.embed_fn, self.frs_method
        params = {"gen": self.gen_params, "frm": self.frm_params,
                  "dirs": self.dirs, "gallery": self.gallery}

        def fn(params, z, p):
            w = z[None, :] + jnp.dot(p, params["dirs"],
                                     precision=jax.lax.Precision.HIGHEST)
            embs = embed_fn(params["gen"], params["frm"], w)
            return D.argmin_dist_refined(embs, params["gallery"], method)

        return fn, params
