"""Exterior derivative (curl) of score/vector fields.

Counterpart of `/root/reference/src/utils/exterior_derivative.py`. For a
field f: R^n -> R^n, (df)_ij = dJ antisymmetrized with the reference's sign
convention df = J - J^T where J_ij = df_i/dx_j (reference `:71-84`).
A conservative (gradient) field has df = 0; the magnitude ||df||_F measures
how far the learned score is from a true gradient field.

TPU-native: `jax.jacrev` + `vmap` replaces the reference's per-batch-element
Python loop over `torch.autograd.functional.jacobian` (`:71-81`) — the whole
batch's Jacobians compute in one XLA program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "ExteriorDerivative",
    "compute_exterior_derivative",
    "compute_exterior_derivative_nd",
    "exterior_derivative_magnitude",
    "is_closed",
    "is_exact",
    "conservative_field",
    "rotation_field",
]


def compute_exterior_derivative(x: jnp.ndarray, fn: Callable) -> jnp.ndarray:
    """df for a flat field. x: [b, n]; fn maps [n] -> [n] (single element).

    Returns [b, n, n] antisymmetric matrices J - J^T.
    """

    def single(xi):
        J = jax.jacrev(fn)(xi)  # J[i, j] = d f_i / d x_j
        return J - J.T

    return jax.vmap(single)(x)


def compute_exterior_derivative_nd(x: jnp.ndarray, fn: Callable) -> jnp.ndarray:
    """df for an arbitrarily-shaped field. x: [b, *dims]; fn maps a batch
    [b, *dims] -> [b, *dims] (a model-style score function).

    Flattens to n = prod(dims) (reference `forward_nd`, `:88-144`) and
    returns [b, n, n].
    """
    b = x.shape[0]
    dims = x.shape[1:]
    n = 1
    for d in dims:
        n *= d

    def single_flat(xf):
        out = fn(xf.reshape((1, *dims)))
        return out.reshape((n,))

    def single(xi):
        J = jax.jacrev(single_flat)(xi)
        return J - J.T

    return jax.vmap(single)(x.reshape(b, n))


def exterior_derivative_magnitude(df: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm per batch element (reference `:288-298`)."""
    return jnp.sqrt(jnp.sum(df**2, axis=tuple(range(1, df.ndim))))


def is_closed(df: jnp.ndarray, tol: float = 1e-5) -> jnp.ndarray:
    """df == 0 (field is closed/conservative) per batch element."""
    return exterior_derivative_magnitude(df) < tol


def is_exact(df: jnp.ndarray, tol: float = 1e-6) -> bool:
    """All-close-to-zero check over the whole batch (reference
    exterior_derivative.py:274-285; on contractible domains exact == closed)."""
    return bool(jnp.all(jnp.abs(df) <= tol))


class ExteriorDerivative:
    """Pipeline-transform wrapper (reference `ExteriorDerivative` class,
    exterior_derivative.py:147-171): holds a field fn and exposes callable
    df computation, for composing into analysis pipelines.

    The fn contract follows `flatten` for EVERY input rank (routing by
    input ndim would silently demand two incompatible signatures from one
    object): flatten=True (default) takes a BATCHED model-style fn
    [b, *dims] -> [b, *dims]; flatten=False takes a single-element fn
    [n] -> [n] over already-flat [b, n] input."""

    def __init__(self, fn: Callable, flatten: bool = True):
        self.fn = fn
        self.flatten = flatten

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.flatten:
            return compute_exterior_derivative_nd(x, self.fn)
        return compute_exterior_derivative(x, self.fn)

    def magnitude(self, x: jnp.ndarray) -> jnp.ndarray:
        return exterior_derivative_magnitude(self(x))


# --- example fields for tests/demos (reference `:205-285`) -----------------


def conservative_field(x: jnp.ndarray) -> jnp.ndarray:
    """grad of potential 0.5 ||x||^2 -> f(x) = x; df must vanish."""
    return x


def rotation_field(x: jnp.ndarray) -> jnp.ndarray:
    """2D rotation f(x, y) = (-y, x); df = [[0, 2], [-2, 0]]-like, nonzero."""
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
