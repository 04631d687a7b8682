"""Parameter-pytree persistence and torch-checkpoint ingestion.

The reference caches converted generator weights as torch pickles
(models/base_generator.py:94-99) and FRM weights ship as ``backbone.pth``
(main_attack.py:43,124). Here the native on-disk format is a flat ``.npz``
(portable, torch-free, mmap-friendly); torch checkpoints are ingested
through a CPU-torch reader and the per-model ``convert_torch_state_dict``
converters, then cached as ``.npz`` so later runs never import torch.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

_SEP = "//"


def flatten_params(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list pytree -> flat {path: array}."""
    flat = {}
    if isinstance(params, (list, tuple)):
        params = {str(i): v for i, v in enumerate(params)}
    for k, v in params.items():
        path = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            flat.update(flatten_params(v, path))
        else:
            flat[path] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    """Inverse of flatten_params. Integer-keyed levels whose keys form a
    dense 0..n-1 range are restored as lists."""
    tree: Dict = {}
    for path, v in flat.items():
        keys = path.split(_SEP)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v

    def restore(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        out = {k: restore(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            idx = sorted(out, key=int)
            if [int(i) for i in idx] == list(range(len(idx))):
                return [out[i] for i in idx]
        return out

    return restore(tree)


def save_params(path: str, params: Dict) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **flatten_params(params))


def load_params(path: str) -> Dict:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy on CPU (offline-converter path)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def load_embeddings(path: str, mmap: bool = False) -> np.ndarray:
    """Load a gallery-embedding array: native .npz (key 'embs'), the
    reference's torch-pickle .pth, or a bare .npy. If the exact path is
    missing, the sibling file with the other extension is probed.

    mmap=True memory-maps bare .npy files (the 1M x 512 regime — 2 GB —
    should stream to device without a second host copy); .npz/.pth formats
    can't be mapped and fall back to a full read."""
    base, ext = osp.splitext(path)
    if not osp.isfile(path):
        for alt in (".npz", ".pth", ".npy"):
            if alt != ext and osp.isfile(base + alt):
                path, ext = base + alt, alt
                break
    if ext == ".npz":
        with np.load(path) as z:
            return np.asarray(z["embs"])
    if ext in (".pth", ".pt"):
        import torch

        return torch.load(path, map_location="cpu").numpy()
    return np.load(path, mmap_mode="r" if mmap else None)


def _cached_convert(path: str, convert, key: str = "") -> Dict:
    """Load ``path`` (.npz native, or .pth/.pt via ``convert``); torch
    checkpoints are converted once and cached next to the original.

    The cache name embeds ``key`` (e.g. the target resolution) and the
    source file's mtime: a resolution-blind cache would hand a later run
    at a different --resolution a wrong-shaped pytree, and an in-place
    checkpoint update would silently keep winning."""
    if path.endswith(".npz"):
        return load_params(path)
    mtime = int(os.path.getmtime(path))
    suffix = f"-{key}" if key else ""
    cache = f"{path}.cfr{suffix}-{mtime}.npz"
    if osp.isfile(cache):
        return load_params(cache)
    params = convert(load_torch_state_dict(path))
    try:
        save_params(cache, params)
    except OSError:
        pass  # read-only weight dir: convert in-memory every run
    return params


def load_generator_params(spec: str, model_name: str = "stylegan_ffhq",
                          resolution: int = 1024, seed: int = 0) -> Dict:
    """spec: path to .npz/.pth weights, or 'random[:<seed>]' for randomly
    initialised weights (benchmarks / smoke tests only)."""
    from ..models import pggan, stylegan

    mod = pggan if model_name.startswith("pggan") else stylegan
    if spec.startswith("random"):
        if ":" in spec:
            seed = int(spec.split(":", 1)[1])
        return mod.convert_torch_state_dict(
            mod.random_torch_style_state_dict(resolution, seed=seed),
            resolution) if mod is pggan else mod.random_params(
                resolution, seed=seed)
    return _cached_convert(
        spec, lambda sd: mod.convert_torch_state_dict(sd, resolution),
        key=f"r{resolution}")


def load_frm_params(spec: str, frs_method: str = "insightface",
                    seed: int = 0) -> Dict:
    """spec: path to .npz/.pth FRM weights, or 'random[:<seed>]'."""
    from ..models import facenet, iresnet

    if frs_method == "insightface":
        if spec.startswith("random"):
            if ":" in spec:
                seed = int(spec.split(":", 1)[1])
            return iresnet.convert_torch_state_dict(
                iresnet.random_torch_style_state_dict("iresnet50", seed=seed))
        return _cached_convert(spec, iresnet.convert_torch_state_dict,
                               key="iresnet50")
    if spec.startswith("random"):
        if ":" in spec:
            seed = int(spec.split(":", 1)[1])
        return facenet.convert_torch_state_dict(
            facenet.random_torch_style_state_dict(seed=seed))
    return _cached_convert(spec, facenet.convert_torch_state_dict,
                           key="facenet")
