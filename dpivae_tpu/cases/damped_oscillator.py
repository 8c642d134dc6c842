"""Damped oscillator case: mass-spring-dashpot displacement time series.

Declarative rebuild of reference cases/damped_oscillator/__init__.py.
Factors: mass m (physics latent), dashpot zeta (damage label), temperature T
(covariate), initial displacement x_0 (nuisance "f" factor that feeds the
surrogate but is not a modality). Physics: analytic undamped oscillator
(only the mass is known physics); surrogate: frozen MLP(4 -> [256,256] -> 64).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from dpivae_tpu.cases import Case, Factor, PriorSpec, Surrogate, register_case
from dpivae_tpu.physics import mass_spring
from dpivae_tpu.utils.io import load_mlp_npz

_ARTIFACT = os.path.join(
    os.path.dirname(__file__), "artifacts", "damped_oscillator.npz"
)

ND_X = 64
# Domain: 200-step simulator grid subsampled to nd_x points
# (ref: cases/damped_oscillator/__init__.py:87-91)
_NT, _DT = 200, 0.05
T_MIN, T_MAX = 0.0, _DT * (_NT - 1)

# (ref: cases/damped_oscillator/__init__.py:25-66)
FACTORS = (
    Factor("m", 1.2, 1.8, "uniform", {"low": 1.2, "high": 1.8}, "x",
           r"$m$ [kg]", 1.5),
    Factor("zeta", 0.0, 2.0, "uniform", {"low": 0.0, "high": 2.0}, "y",
           r"$c_\mathrm{d}$ [kg/s]", 0.0),
    Factor("T", 0.01, 39.99, "uniform", {"low": 0.01, "high": 39.99}, "c",
           r"$T [\mathrm{C}^o]$", 20.0),
    Factor("x_0", 0.9, 1.1, "uniform", {"low": 0.9, "high": 1.1}, "f",
           r"$x_0$ [m]", 1.0),
)

# (ref: cases/damped_oscillator/__init__.py:68-75)
PRIOR_X = (
    PriorSpec("m", 1.0, 2.0, "uniform", {"low": 1.0, "high": 2.0}),
)

# (ref: cases/damped_oscillator/__init__.py:138-154)
PRESETS = {
    "vae": {
        "model_type": "P",
        "lambda_g0": -1.0,
        "lambda_x": None,
        "nz_c": 4,
        "nz_y": 4,
    },
    "dpivae": {
        "model_type": "S",
        "lambda_g0": 1 / 128,
        "lambda_x": None,
        "nz_c": 4,
        "nz_y": 4,
    },
}


@register_case("damped_oscillator")
@functools.lru_cache(maxsize=None)
def build() -> Case:
    params, extras = load_mlp_npz(_ARTIFACT)
    full_model = Surrogate(
        params=params,
        scaler_mean=extras["scaler_mean"],
        scaler_scale=extras["scaler_scale"],
    )
    t = np.linspace(T_MIN, T_MAX, ND_X).astype(np.float32)
    return Case(
        name="damped_oscillator",
        factors=FACTORS,
        prior_x=PRIOR_X,
        nd_x=ND_X,
        t_min=T_MIN,
        t_max=T_MAX,
        sigma_x=0.01,
        sigma_c=0.01,
        sigma_y=0.01,
        full_model=full_model,
        # Undamped analytic physics on the mass latent only
        # (ref: cases/damped_oscillator/__init__.py:133)
        part_model=lambda z: mass_spring(z, t),
        presets=PRESETS,
        x_unit="Time [s]",
        y_unit="[m]",
        ylim=(-2.0, 2.0),
        x_full=extras["X"],
        y_full=extras["y_full"],
    )
