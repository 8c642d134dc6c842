"""One-shot converter: reference torch artifacts -> framework-native npz.

Reads the reference's pretrained surrogate state dicts and simulator input
datasets (reference cases/*/{full_model,part_model,X.pt,X_partial.pt}),
fits the input StandardScalers exactly as the reference does at case import
(population std; ref cases/simple_beam/__init__.py:107-108), regenerates the
missing simulator outputs ``y`` by running the frozen surrogate over X (the
snapshot lacks y.pt — SURVEY.md §2/L5a), and writes one npz per case under
``dpivae_tpu/cases/artifacts/``.

Run: ``python -m dpivae_tpu.cases._convert``. Requires torch (CPU) and the
reference mount (or DPIVAE_REFERENCE_CASES).
"""

from __future__ import annotations

import os

import numpy as np

from dpivae_tpu.utils.io import (
    reference_case_dir,
    save_mlp_npz,
    torch_state_dict_to_layers,
    torch_tensor_to_numpy,
)

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "artifacts")


def _scaler_stats(X: np.ndarray):
    return (
        X.mean(axis=0, keepdims=True).astype(np.float32),
        X.std(axis=0, keepdims=True).astype(np.float32),  # ddof=0
    )


def _mlp_forward_np(layers, X, mean, scale):
    h = (X - mean) / scale
    for layer in layers[:-1]:
        h = np.tanh(h @ layer["w"] + layer["b"])
    return h @ layers[-1]["w"] + layers[-1]["b"]


def convert_case(case: str) -> str:
    ref = reference_case_dir(case)
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    out = os.path.join(ARTIFACT_DIR, f"{case}.npz")

    X = torch_tensor_to_numpy(os.path.join(ref, "X.pt"))
    full_layers = torch_state_dict_to_layers(os.path.join(ref, "full_model"))
    mean, scale = _scaler_stats(X)
    y_full = _mlp_forward_np(full_layers, X, mean, scale).astype(np.float32)

    extra = {
        "scaler_mean": mean,
        "scaler_scale": scale,
        "X": X,
        "y_full": y_full,
    }

    if case == "bridge":
        X_part = torch_tensor_to_numpy(os.path.join(ref, "X_partial.pt"))
        part_layers = torch_state_dict_to_layers(os.path.join(ref, "part_model"))
        p_mean, p_scale = _scaler_stats(X_part)
        y_part = _mlp_forward_np(part_layers, X_part, p_mean, p_scale).astype(
            np.float32
        )
        for i, layer in enumerate(part_layers):
            extra[f"part_w{i}"] = layer["w"]
            extra[f"part_b{i}"] = layer["b"]
        extra.update(
            part_scaler_mean=p_mean,
            part_scaler_scale=p_scale,
            X_part=X_part,
            y_part=y_part,
        )

    save_mlp_npz(out, full_layers, **extra)
    return out


def main():
    for case in ("simple_beam", "damped_oscillator", "bridge"):
        path = convert_case(case)
        with np.load(path) as d:
            sizes = {k: d[k].shape for k in d.files}
        print(f"{case}: wrote {path}")
        print(f"  {sizes}")


if __name__ == "__main__":
    main()
