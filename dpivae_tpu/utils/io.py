"""PyTorch-artifact import: ``.pt`` tensors and state dicts -> JAX pytrees.

The case studies ship pretrained frozen surrogates and simulator input
datasets as torch artifacts (reference cases/*/full_model, X.pt; loaded at
reference cases/simple_beam/__init__.py:97-126). This module converts them
once into framework-native ``.npz`` archives (committed under
``dpivae_tpu/cases/artifacts/``) so the framework runs without torch; torch
(CPU) is only needed to re-run the conversion.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def torch_tensor_to_numpy(path: str) -> np.ndarray:
    """Load a ``.pt`` tensor on CPU as float32 numpy."""
    import torch

    t = torch.load(path, weights_only=True, map_location="cpu")
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def torch_state_dict_to_layers(path: str) -> List[Dict[str, np.ndarray]]:
    """Convert a torch ``nn.Sequential``-of-Linear state dict to an ordered
    list of ``{"w": (in, out), "b": (out,)}`` layers.

    Keys look like ``net.0.weight`` / ``net.linear_0.weight``; ordering
    follows the integer embedded in each key. Torch stores weights as
    (out, in); JAX params are (in, out), so weights are transposed.
    """
    import re

    import torch

    sd = torch.load(path, weights_only=True, map_location="cpu")
    weights: Dict[int, np.ndarray] = {}
    biases: Dict[int, np.ndarray] = {}
    for key, tensor in sd.items():
        m = re.search(r"(\d+)\.(weight|bias)$", key)
        if m is None:
            raise ValueError(f"Unrecognized state-dict key: {key}")
        idx, kind = int(m.group(1)), m.group(2)
        arr = np.asarray(tensor.detach().cpu().numpy(), dtype=np.float32)
        if kind == "weight":
            weights[idx] = arr.T
        else:
            biases[idx] = arr
    if set(weights) != set(biases):
        raise ValueError("Mismatched weight/bias keys in state dict")
    return [
        {"w": weights[i], "b": biases[i]} for i in sorted(weights)
    ]


def layers_to_mlp_params(layers: List[Dict[str, np.ndarray]]) -> dict:
    """Wrap ordered layers in the ``models.nn.mlp_init`` pytree structure."""
    return {"layers": tuple(layers)}


def save_mlp_npz(path: str, layers: List[Dict[str, np.ndarray]], **extra) -> None:
    """Persist an imported MLP (+ scaler stats etc.) as a flat npz."""
    flat = {}
    for i, layer in enumerate(layers):
        flat[f"w{i}"] = layer["w"]
        flat[f"b{i}"] = layer["b"]
    flat.update(extra)
    np.savez(path, **flat)


def load_mlp_npz(path: str) -> Tuple[dict, Dict[str, np.ndarray]]:
    """Load an npz saved by ``save_mlp_npz``.

    Returns (mlp_params, extras) where extras holds any non-layer arrays
    (e.g. scaler mean/scale, input data).
    """
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    layers = []
    i = 0
    while f"w{i}" in arrays:
        layers.append({"w": arrays.pop(f"w{i}"), "b": arrays.pop(f"b{i}")})
        i += 1
    return layers_to_mlp_params(layers), arrays


def reference_case_dir(case: str) -> str:
    """Path of a reference case's artifact directory, overridable via
    ``DPIVAE_REFERENCE_CASES`` for machines without the reference mount."""
    root = os.environ.get("DPIVAE_REFERENCE_CASES", "/root/reference/cases")
    return os.path.join(root, case)
