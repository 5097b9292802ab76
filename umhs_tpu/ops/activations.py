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
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
