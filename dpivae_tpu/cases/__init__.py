"""Declarative case studies.

The reference defines each case as a module with heavy *import-time side
effects* — loading ``.pt`` data, fitting scalers, building and freezing
surrogate MLPs (reference cases/simple_beam/__init__.py:97-138). Here a case
is a plain dataclass built on demand by ``get_case(name)`` (cached), with
frozen surrogates as pure closures over imported numpy weights.

Case contract (mirrors the reference ``definition`` dict, see SURVEY.md
§2/L5a): factor table, fixed prior on z_x, evaluation grid, noise levels,
frozen full/partial models, presets.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dpivae_tpu.utils.priors import (
    factor_indices,
    get_prior_dist,
    get_shapes_from_factors,
    phys_covariate_indices,
)


@dataclasses.dataclass(frozen=True)
class Factor:
    """One ground-truth generative factor (ref: cases/*/dict_gt entries)."""

    name: str
    lb: float
    ub: float
    dist: str  # "uniform" | "normal"
    args: Mapping[str, float]
    type: str  # "x" | "c" | "y" | "f"
    label: str
    val: float
    phys: bool = False


@dataclasses.dataclass(frozen=True)
class PriorSpec:
    """Fixed VAE prior on one z_x dim (ref: cases/*/dict_prior_x entries)."""

    name: str
    lb: float
    ub: float
    dist: str
    args: Mapping[str, float]


@dataclasses.dataclass(frozen=True)
class Surrogate:
    """Frozen MLP surrogate with an input StandardScaler, as a pure callable
    (ref: models/nn.py:28-80 instantiated at cases/*/__init__.py).

    Weights/scaler are numpy constants — they embed into the XLA program of
    whatever jitted function calls the surrogate (zero runtime overhead,
    nothing to thread through params/optimizers).
    """

    params: Any  # {"layers": ({"w","b"}, ...)}
    scaler_mean: np.ndarray
    scaler_scale: np.ndarray

    def __call__(self, z):
        """Compute follows the input dtype: a bf16 decode path
        (models/vae.py compute_dtype) hands bf16 latents through here and
        the frozen weights/scaler cast to match at trace time — otherwise
        f32 numpy constants would silently promote everything back to f32
        and the surrogate (the widest block at scaled shapes) would stay
        full-precision. f32 input (the default everywhere) is a no-op."""
        import jax

        from dpivae_tpu.models.nn import mlp_apply

        dt = jnp.result_type(z)
        if not jnp.issubdtype(dt, jnp.floating):
            dt = jnp.float32
        params = self.params
        if dt != jnp.float32:
            params = jax.tree.map(lambda a: jnp.asarray(a, dt), params)
        z = (z - jnp.asarray(self.scaler_mean, dt)) / jnp.asarray(
            self.scaler_scale, dt
        )
        return mlp_apply(params, z, nonlinearity=jnp.tanh)


@dataclasses.dataclass(frozen=True)
class Case:
    """A complete case study definition."""

    name: str
    factors: Tuple[Factor, ...]
    prior_x: Tuple[PriorSpec, ...]
    nd_x: int
    t_min: float
    t_max: float
    sigma_x: float
    sigma_c: float
    sigma_y: float
    full_model: Callable
    part_model: Callable
    presets: Mapping[str, Mapping[str, Any]]
    x_unit: str = ""
    y_unit: str = ""
    ylim: Tuple[float, float] = (-1.0, 1.0)
    # Simulator datasets (imported; y regenerated through the surrogate
    # because the reference snapshot is missing y.pt — SURVEY.md §2/L5a)
    x_full: Optional[np.ndarray] = None
    y_full: Optional[np.ndarray] = None
    x_part: Optional[np.ndarray] = None
    y_part: Optional[np.ndarray] = None
    # Categorical-label machinery (unused by all three cases, kept for
    # contract parity: ref definition keys n_classes/bins_y/nk_y/logsoftmax_y)
    n_classes: Optional[int] = None
    bins_y: Optional[np.ndarray] = None
    nk_y: Optional[int] = None
    logsoftmax_y: bool = False

    # -- derived ------------------------------------------------------
    @property
    def shapes(self) -> Tuple[int, int, int, int, int]:
        """(nz_x, nd_c, nd_y, nd_f, nd_p)"""
        return get_shapes_from_factors(self.factors)

    @property
    def nz_x(self) -> int:
        return self.shapes[0]

    @property
    def nd_c(self) -> int:
        return self.shapes[1]

    @property
    def nd_y(self) -> int:
        return self.shapes[2]

    @property
    def nd_f(self) -> int:
        return self.shapes[3]

    @property
    def nd_p(self) -> int:
        return self.shapes[4]

    @property
    def t(self) -> np.ndarray:
        return np.linspace(self.t_min, self.t_max, self.nd_x)

    @property
    def idx_c_phys(self) -> Tuple[int, ...]:
        return tuple(phys_covariate_indices(self.factors))

    @property
    def z_idx_x(self) -> Tuple[int, ...]:
        return tuple(factor_indices(self.factors, "x"))

    @property
    def z_idx_c(self) -> Tuple[int, ...]:
        return tuple(factor_indices(self.factors, "c"))

    @property
    def z_idx_y(self) -> Tuple[int, ...]:
        return tuple(factor_indices(self.factors, "y"))

    def gt_dist(self):
        """Product ground-truth sampling distribution over all factors."""
        return get_prior_dist(self.factors)

    def prior_x_dist(self):
        """Fixed marginal prior over z_x."""
        return get_prior_dist(self.prior_x)

    def fingerprint(self) -> str:
        """Content digest of everything a compiled program bakes in.

        The AOT executable cache (utils/aot.py) keys programs on the case;
        the name alone is not identity — a user-defined Case may share a
        name with different priors/factors/surrogate weights, and a stale
        executable would train against the OLD definitions silently.
        Hashes every field recursively with type-tagged length framing:
        scalars/strings by repr, arrays by bytes, dataclasses
        (Factor/PriorSpec/Surrogate) field-by-field, functools.partial by
        (func, args, keywords), bound methods by (code, instance state),
        other callables by source (best-effort; falls back to qualname)
        plus closure cells and defaults. Known residual: a function's
        module-level globals outside this package are not hashed — if a
        custom case's physics reads mutable globals, pass them via partial
        or closure (or disable the AOT cache) to keep staleness tracking
        sound.
        """
        cached = self.__dict__.get("_fingerprint")
        if cached is not None:
            return cached

        import functools
        import hashlib
        import inspect
        import re

        h = hashlib.sha256()

        def tag(kind, payload: bytes):
            # Length-framed, type-tagged: without framing, adjacent sibling
            # reprs concatenate ambiguously ((12, 3) vs (1, 23) both b'123')
            # and nesting boundaries vanish.
            h.update(b"<%s:%d>" % (kind.encode(), len(payload)))
            h.update(payload)

        def feed(o):
            if o is None or isinstance(o, (str, int, float, bool, bytes)):
                tag(type(o).__name__, repr(o).encode())
            elif isinstance(o, np.ndarray) or hasattr(o, "__jax_array__") \
                    or type(o).__module__.startswith("jax"):
                a = np.asarray(o)
                tag("arr", str((a.shape, str(a.dtype))).encode())
                tag("buf", a.tobytes())
            elif isinstance(o, (list, tuple)):
                tag("seq", str(len(o)).encode())
                for x in o:
                    feed(x)
            elif isinstance(o, (set, frozenset)):
                tag("set", str(len(o)).encode())
                for x in sorted(o, key=repr):
                    feed(x)
            elif isinstance(o, Mapping):
                tag("map", str(len(o)).encode())
                for k in sorted(o, key=repr):
                    feed(k)
                    feed(o[k])
            elif isinstance(o, functools.partial):
                tag("partial", b"")
                feed(o.func)
                feed(tuple(o.args))
                feed(dict(o.keywords))
            elif inspect.ismethod(o):  # bound method: code + instance state
                tag("method", o.__func__.__qualname__.encode())
                feed(o.__func__)
                feed(getattr(o.__self__, "__dict__", repr(o.__self__)))
            elif dataclasses.is_dataclass(o) and not isinstance(o, type):
                tag("dc", type(o).__qualname__.encode())
                for f in dataclasses.fields(o):
                    tag("field", f.name.encode())
                    feed(getattr(o, f.name))
            elif callable(o):
                try:
                    tag("src", inspect.getsource(o).encode())
                except (OSError, TypeError):
                    tag("qualname", getattr(
                        o, "__qualname__", type(o).__qualname__
                    ).encode())
                for cell in getattr(o, "__closure__", None) or ():
                    try:
                        feed(cell.cell_contents)
                    except ValueError:  # empty cell
                        pass
                for d in getattr(o, "__defaults__", None) or ():
                    feed(d)
            else:
                # Last resort: repr, with per-process memory addresses
                # stripped so the digest stays stable across processes.
                tag("repr", re.sub(
                    r"0x[0-9a-fA-F]+", "0x", repr(o)
                ).encode())

        feed(self)
        digest = h.hexdigest()
        object.__setattr__(self, "_fingerprint", digest)  # frozen-safe memo
        return digest


_REGISTRY: Dict[str, Callable[[], Case]] = {}


def register_case(name: str):
    def wrap(builder: Callable[[], Case]):
        _REGISTRY[name] = builder
        return builder

    return wrap


@functools.lru_cache(maxsize=None)
def get_case(name: str) -> Case:
    # Import case modules lazily so artifact loading happens on first use
    from dpivae_tpu.cases import bridge, damped_oscillator, simple_beam  # noqa: F401

    if name not in _REGISTRY:
        raise KeyError(f"Unknown case {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def list_cases() -> Sequence[str]:
    from dpivae_tpu.cases import bridge, damped_oscillator, simple_beam  # noqa: F401

    return sorted(_REGISTRY)
