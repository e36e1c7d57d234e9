"""Parameter constraint transforms (raw <-> constrained).

The reference relies on gpytorch's constraint machinery: kernel lengthscales /
outputscales / linear-kernel variances use a softplus ("Positive") transform and
likelihood noises use a sigmoid-based Interval transform
(cf. /root/reference/mobocmf/models/mfdgp.py:116 `Interval(1e-8, 0.1*y_std)`).

We re-implement the same two transforms as pure functions so that a parameter
pytree of *raw* values maps to the same constrained values the reference would
produce, which is what the 1e-5 parity bar requires.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax.numpy as jnp

Array = jnp.ndarray
Scalar = Union[float, Array]


def softplus(x: Scalar) -> Array:
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y: Scalar) -> Array:
    """Exact inverse of softplus: log(expm1(y)); stable for large y."""
    y = jnp.asarray(y)
    # for large y, log(expm1(y)) ~= y; switch to avoid overflow
    return jnp.where(y > 20.0, y, jnp.log(jnp.expm1(jnp.where(y > 20.0, 1.0, y))))


@dataclasses.dataclass(frozen=True)
class Positive:
    """constrained = softplus(raw). gpytorch's default for kernel params."""

    def forward(self, raw: Scalar) -> Array:
        return softplus(raw)

    def inverse(self, value: Scalar) -> Array:
        return inv_softplus(value)


@dataclasses.dataclass(frozen=True)
class Interval:
    """constrained = lower + (upper-lower) * sigmoid(raw)."""

    lower: float
    upper: float

    def forward(self, raw: Scalar) -> Array:
        return self.lower + (self.upper - self.lower) * jnp.reciprocal(
            1.0 + jnp.exp(-jnp.asarray(raw))
        )

    def inverse(self, value: Scalar) -> Array:
        t = (jnp.asarray(value) - self.lower) / (self.upper - self.lower)
        t = jnp.clip(t, 1e-12, 1.0 - 1e-12)
        return jnp.log(t) - jnp.log1p(-t)


@dataclasses.dataclass(frozen=True)
class GreaterThan:
    """constrained = lower + softplus(raw)."""

    lower: float

    def forward(self, raw: Scalar) -> Array:
        return self.lower + softplus(raw)

    def inverse(self, value: Scalar) -> Array:
        return inv_softplus(jnp.asarray(value) - self.lower)
