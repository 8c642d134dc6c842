"""Invertible transforms (bijectors) as pure functions.

Functional re-design of the reference transform stack (reference
utils/transforms.py:13-199). Every transform is a frozen dataclass with
``forward(z) -> (z', log_det)`` and ``inverse(z) -> (z', log_det)``; there is
no in-place mutation — the reference's masked in-place update
(utils/transforms.py:176) becomes a functional scatter via ``z.at[...]``.

Log-determinant conventions replicate the reference exactly, including its
quirks (e.g. ShiftScale's forward log-det broadcast; see each class).
Instances are registered as jax pytrees so they can be closed over or passed
through jit boundaries freely.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


class StandardScaler:
    """Standardize by mean/std fitted on data (ref: utils/transforms.py:43-79).

    forward: z -> (z - mean) / scale, log_det = -sum(log scale)
    inverse: z -> z * scale + mean,   log_det = +sum(log scale)
    """

    def __init__(self, mean=None, scale=None):
        self.mean = None if mean is None else jnp.asarray(mean)
        self.scale = None if scale is None else jnp.asarray(scale)

    @classmethod
    def fit(cls, sample) -> "StandardScaler":
        sample = jnp.asarray(sample)
        # Population std (ddof=0), matching torch std(unbiased=False)
        # (ref: utils/transforms.py:67)
        return cls(
            mean=jnp.mean(sample, axis=0, keepdims=True),
            scale=jnp.std(sample, axis=0, keepdims=True),
        )

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        out = (z - self.mean) / self.scale
        log_det = -jnp.sum(jnp.log(self.scale)) * jnp.ones(z.shape[:-1])
        return out, log_det

    def inverse(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        out = z * self.scale + self.mean
        log_det = jnp.sum(jnp.log(self.scale)) * jnp.ones(z.shape[:-1])
        return out, log_det

    def tree_flatten(self):
        return (self.mean, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class ShiftScale:
    """Affine map from the unit box to [lb, ub] (ref: utils/transforms.py:82-105).

    forward: z -> z * (ub - lb) + lb, log_det = sum(log|ub - lb|)
    """

    def __init__(self, lb, ub):
        self.lb = jnp.asarray(lb)
        self.ub = jnp.asarray(ub)

    @property
    def a(self):
        return self.ub - self.lb

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        out = z * self.a + self.lb
        # The reference broadcasts log|a| over the full z shape then sums the
        # last dim (ref: utils/transforms.py:99) — equivalent to a constant
        # sum(log|a|) per batch element.
        log_det = jnp.sum(
            jnp.log(jnp.abs(self.a)) * jnp.ones(z.shape), axis=-1
        )
        return out, log_det

    def inverse(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        out = z / self.a - self.lb / self.a
        log_det = -jnp.sum(jnp.log(self.a)) * jnp.ones(z.shape[:-1])
        return out, log_det

    def tree_flatten(self):
        return (self.lb, self.ub), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Logistic:
    """Sigmoid squashing z -> sigmoid(k*z) with exact log-det
    (ref: utils/transforms.py:108-133).

    log|det J| per element = k*z - 2*softplus(k*z) + log(k).
    The inverse is intentionally unimplemented, as in the reference.
    """

    def __init__(self, k: float = 1.0):
        self.k = k

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        kz = self.k * z
        log_det = jnp.sum(
            kz - 2.0 * jax.nn.softplus(kz) + math.log(self.k), axis=-1
        )
        return jax.nn.sigmoid(kz), log_det

    def inverse(self, z):
        raise NotImplementedError("Inverse not implemented for this transform")

    def tree_flatten(self):
        return (), self.k

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(k=aux)


class Chain:
    """Compose transforms, accumulating log-dets (ref: utils/transforms.py:136-157)."""

    def __init__(self, *transforms):
        self.transforms = tuple(transforms)

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        log_det = jnp.zeros(z.shape[:-1])
        for t in self.transforms:
            z, ld = t.forward(z)
            log_det = log_det + ld
        return z, log_det

    def inverse(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        log_det = jnp.zeros(z.shape[:-1])
        for t in reversed(self.transforms):
            z, ld = t.inverse(z)
            log_det = log_det + ld
        return z, log_det

    def tree_flatten(self):
        return self.transforms, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class MaskedChain:
    """Apply a transform chain only to the listed indices of the last axis
    (ref: utils/transforms.py:160-186).

    The reference mutates ``z[..., mask]`` in place; here the update is a
    functional scatter. ``mask`` is a static tuple of integer indices so the
    gather/scatter lowers to static slices under jit.
    """

    def __init__(self, mask: Sequence[int], *transforms):
        self.mask = tuple(int(i) for i in mask)
        self.chain = Chain(*transforms)

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        idx = jnp.asarray(self.mask)
        z_masked, log_det = self.chain.forward(z[..., idx])
        return z.at[..., idx].set(z_masked), log_det

    def inverse(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        idx = jnp.asarray(self.mask)
        z_masked, log_det = self.chain.inverse(z[..., idx])
        return z.at[..., idx].set(z_masked), log_det

    def tree_flatten(self):
        return (self.chain,), self.mask

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.mask = aux
        obj.chain = children[0]
        return obj


class Flip:
    """Direction-swapping wrapper: ``forward``/``inverse`` exchanged.

    The reference bakes a ``flip`` flag into its Transform ABC
    (utils/transforms.py:19,30-40); functionally that is just composition
    with this wrapper.
    """

    def __init__(self, transform):
        self.transform = transform

    def forward(self, z):
        return self.transform.inverse(z)

    def inverse(self, z):
        return self.transform.forward(z)

    def tree_flatten(self):
        return (self.transform,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


class Identity:
    """No-op transform (ref: utils/transforms.py:189-199)."""

    def forward(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        return z, jnp.zeros(z.shape[:-1])

    def inverse(self, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = jnp.asarray(z)
        return z, jnp.zeros(z.shape[:-1])

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()


for _cls in (StandardScaler, ShiftScale, Logistic, Chain, MaskedChain, Flip, Identity):
    jax.tree_util.register_pytree_node(
        _cls, _cls.tree_flatten, _cls.tree_unflatten
    )
