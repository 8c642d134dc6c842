"""Portable serving artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story at all: a trained model lives only in
the Python process that trained it (SURVEY.md §5 — its ``output/*/models``
dir is created but never written). ``train/checkpoint.py`` already adds
restorable checkpoints; this module goes one step further and packages the
*predict path itself* as a serialized StableHLO program:

- **weights baked in** — the params pytree is closed over, so the artifact
  is self-contained; no Python model code, case definition, or checkpoint
  is needed at serving time, only jax (or any StableHLO runtime);
- **shape-polymorphic batch** — one artifact serves any batch size;
- **multi-platform** — lowered for both ``cpu`` and ``tpu`` by default, so
  the same file deploys to a TPU pod or a CPU fallback host;
- **plain-array ABI** — inputs are ``(key_data: uint32[2], x: f32[b, nd_x],
  c: f32[b, nd_c])``; outputs are MC-posterior means, reduced inside the
  program (the (n_mc, b, d) sample tensors never cross the ABI).

A JSON sidecar records the input/output contract and provenance (case
fingerprint, config, jax version) so a serving host can validate requests
without deserializing the program.
"""

from __future__ import annotations

import json
import os
import warnings
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Named slots into the 9-tuple model.sample returns (ref: models/vae.py:255).
SAMPLE_SLOTS = {
    "x_sample": 0,
    "xh_p": 1,
    "xh_d": 2,
    "c_sample": 3,
    "y": 4,
    "zx": 5,
    "zc": 6,
    "zy": 7,
}

_FORMAT = "dpivae_tpu.serving/1"


def build_predict_fn(model, params, config, *, cond: bool = False,
                     n: Optional[int] = None,
                     outputs: Sequence[str] = ("y",)):
    """A self-contained ``(key_data, x, c) -> tuple`` predictor.

    ``params`` and the model's fitted scalers are closed over; each output
    is the MC mean over ``n`` posterior samples of the named
    ``model.sample`` slot (``n`` defaults to ``config.n_mc_test``). The key
    enters as raw uint32 data so the exported ABI has no jax-typed-key
    input.
    """
    unknown = [o for o in outputs if o not in SAMPLE_SLOTS]
    if unknown:
        raise ValueError(
            f"unknown outputs {unknown}; choose from {sorted(SAMPLE_SLOTS)}"
        )
    if n is None:
        n = config.n_mc_test
    slots = tuple(SAMPLE_SLOTS[o] for o in outputs)
    frozen = jax.tree.map(jnp.asarray, params)

    def predict(key_data, x, c):
        key = jax.random.wrap_key_data(key_data)
        out = model.sample(
            frozen, key, x, c, cond=cond, n=n, grl_alpha=config.lambda_g0
        )
        return tuple(jnp.mean(out[i], axis=0) for i in slots)

    return predict


def export_predictor(model, params, config, case=None, *,
                     cond: bool = False, n: Optional[int] = None,
                     outputs: Sequence[str] = ("y",),
                     platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the predict path as a ``jax.export.Exported`` + meta dict.

    The batch dimension is symbolic — one artifact serves any request
    size. A ``use_pallas`` model is exported through the XLA decode path
    (a Pallas TPU kernel cannot lower for the multi-platform artifact).
    The two paths agree to the kernel's parity tolerance — rtol 1e-4 on
    TPU (tests/test_pallas_model.py), not bit-identical — so served
    values can differ from training-time decode outputs at that level; a
    one-time warning marks the downgrade.
    """
    import dataclasses

    import jax.export as jex

    if getattr(model, "use_pallas", False):
        warnings.warn(
            "export_predictor: use_pallas=True model exported through the "
            "XLA decode path (the Pallas TPU kernel cannot lower for a "
            "multi-platform artifact); served values match training-time "
            "decode to the kernel parity tolerance (rtol 1e-4 on TPU), "
            "not bit-exactly.",
            stacklevel=2,
        )
        model = dataclasses.replace(model, use_pallas=False)
    predict = build_predict_fn(
        model, params, config, cond=cond, n=n, outputs=tuple(outputs)
    )
    (b,) = jex.symbolic_shape("b")
    # The key-data ABI follows the exporting process's default PRNG impl
    # (threefry: uint32[2]; rbg under DPIVAE_PRNG=rbg: uint32[4]); the
    # impl name is recorded in the meta so serving hosts with a different
    # default still construct matching keys.
    prng_impl = str(jax.config.jax_default_prng_impl)
    kd = jax.eval_shape(lambda: jax.random.key_data(jax.random.PRNGKey(0)))
    key_spec = jax.ShapeDtypeStruct(kd.shape, kd.dtype)
    x_spec = jax.ShapeDtypeStruct((b, model.nd_x), jnp.float32)
    c_spec = jax.ShapeDtypeStruct((b, model.nd_c), jnp.float32)
    exported = jex.export(jax.jit(predict), platforms=tuple(platforms))(
        key_spec, x_spec, c_spec
    )
    meta = {
        "format": _FORMAT,
        "outputs": list(outputs),
        "cond": bool(cond),
        "n_mc": int(n if n is not None else config.n_mc_test),
        "lambda_g0": float(config.lambda_g0),
        "nd_x": int(model.nd_x),
        "nd_c": int(model.nd_c),
        "platforms": list(platforms),
        "prng_impl": prng_impl,
        "inputs": [
            {"name": "key_data", "shape": list(kd.shape),
             "dtype": str(kd.dtype)},
            {"name": "x", "shape": ["b", int(model.nd_x)], "dtype": "float32"},
            {"name": "c", "shape": ["b", int(model.nd_c)], "dtype": "float32"},
        ],
        "jax_version": jax.__version__,
        "config": json.loads(config.to_json()),
    }
    if case is not None:
        meta.update(case=case.name, case_fingerprint=case.fingerprint())
    return exported, meta


def save_predictor(path: str, model, params, config, case=None, *,
                   cond: bool = False, n: Optional[int] = None,
                   outputs: Sequence[str] = ("y",),
                   platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """One-call export: write ``<path>`` (StableHLO bytes) +
    ``<path>.meta.json`` and return the artifact path."""
    exported, meta = export_predictor(
        model, params, config, case,
        cond=cond, n=n, outputs=outputs, platforms=platforms,
    )
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return path


@dataclass(frozen=True)
class ServedPredictor:
    """A deserialized serving artifact: callable, no model code needed."""

    exported: object
    meta: dict

    @property
    def outputs(self) -> Tuple[str, ...]:
        return tuple(self.meta["outputs"])

    @property
    def _jitted(self):
        # Bare Exported.call re-dispatches through the export calling
        # convention every invocation (~4 ms/call measured on CPU); under
        # jit each request shape compiles once and then hits the jit
        # cache, matching the live-jit path's per-call latency.
        fn = self.__dict__.get("_jitted_fn")
        if fn is None:
            fn = jax.jit(self.exported.call)
            object.__setattr__(self, "_jitted_fn", fn)
        return fn

    def __call__(self, x, c, *, seed: int = 0, key=None):
        """Predict on host arrays; returns a dict of named numpy outputs."""
        if key is None:
            # Construct the key with the ARTIFACT's PRNG impl, not the
            # process default — a host running under DPIVAE_PRNG=rbg can
            # still serve a threefry-exported artifact (and vice versa).
            # On the host CPU backend: key construction is two eager ops,
            # and on a remote/tunneled accelerator each eager op is a
            # device round trip that would double per-request latency
            # (measured 62 ms vs 29 ms p50 through the TPU tunnel).
            from dpivae_tpu.utils import on_host_cpu

            impl = self.meta.get("prng_impl")
            with on_host_cpu():
                key = jax.random.key(seed, impl=impl) if impl else (
                    jax.random.PRNGKey(seed)
                )
                key_data = np.asarray(jax.random.key_data(key), np.uint32)
        else:
            key_data = np.asarray(jax.random.key_data(key), np.uint32)
        want = tuple(self.meta["inputs"][0]["shape"])
        if key_data.shape != want:
            raise ValueError(
                f"key data shape {key_data.shape} does not match the "
                f"artifact's PRNG impl {self.meta.get('prng_impl')!r} "
                f"(expects {want}); pass a key of that impl or use seed="
            )
        x = np.asarray(x, np.float32)
        c = np.asarray(c, np.float32)
        out = self._jitted(key_data, x, c)
        return {
            name: np.asarray(val) for name, val in zip(self.outputs, out)
        }


def load_predictor(path: str) -> ServedPredictor:
    """Load a ``save_predictor`` artifact for serving."""
    import jax.export as jex

    path = os.path.abspath(path)
    with open(path, "rb") as f:
        exported = jex.deserialize(f.read())
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    if meta.get("format") != _FORMAT:
        raise ValueError(
            f"{path!r} is not a dpivae_tpu serving artifact "
            f"(format={meta.get('format')!r})"
        )
    return ServedPredictor(exported=exported, meta=meta)
