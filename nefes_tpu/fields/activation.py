"""Custom activations (reference script/models/activation.py).

``trunc_exp``: exp with gradient computed from a clamped input — keeps
density optimisation stable for instant-ngp style fields (reference
activation.py:8-20, a custom autograd Function there; a custom_vjp here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    # clamp the saved input to [-15, 15] before the exp in the backward
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def trunc_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with input clamped in the backward (activation.py:22-24)."""
    return jax.nn.softplus(jnp.clip(x, -15.0, 15.0))
