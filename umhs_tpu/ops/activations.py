"""Activation functions with custom gradients.

trunc_exp mirrors the density rectifier the reference inherits from
nerfstudio (`trunc_exp`, used at /root/reference/umhsnerf/umhs_field.py:327):
exp in the forward pass, with the incoming pre-activation clamped to
[-15, 15] in the backward pass so mixed-precision density parameters cannot
blow up the gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    # Forward clamp at 15 as well (exp(15) ~ 3.3e6 — opaque at any step
    # size): an unclamped exp overflows f32 to inf early in training with
    # lr 2e-2, and inf * selector(=0) = NaN permanently poisons the
    # occupancy grid's EMA (max(nan, x) = nan) — the grid goes empty and
    # training silently collapses to background fitting.
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, -15.0, 15.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
