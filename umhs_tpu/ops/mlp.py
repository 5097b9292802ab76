"""Functional MLP: init + apply over parameter pytrees.

Equivalent of nerfstudio's MLP module used for every head in the reference
field (/root/reference/umhsnerf/umhs_field.py:67-113): `num_layers` linear
layers, ReLU between them, optional output activation. Parameters are plain
dicts so the whole model is one transparent pytree for pjit.

Init matches torch.nn.Linear defaults (uniform +/- 1/sqrt(fan_in) for both
weight and bias) so training dynamics track the reference's torch
implementation path (`implementation="torch"`).

MLP widths here are tiny (16-64); the matmuls are batched over hundreds of
thousands of ray samples per step, so XLA maps them onto the MXU as
(N, in) @ (in, width) GEMMs and fuses the ReLUs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    in_dim: int,
    num_layers: int,
    layer_width: int,
    out_dim: int,
    dtype=jnp.float32,
):
    """Create params for an MLP with `num_layers` linear layers."""
    if num_layers == 1:
        dims = [(in_dim, out_dim)]
    else:
        dims = (
            [(in_dim, layer_width)]
            + [(layer_width, layer_width)] * (num_layers - 2)
            + [(layer_width, out_dim)]
        )
    layers = []
    for fan_in, fan_out in dims:
        key, wk, bk = jax.random.split(key, 3)
        bound = 1.0 / (fan_in**0.5)
        layers.append(
            {
                "w": jax.random.uniform(
                    wk, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype
                ),
                "b": jax.random.uniform(
                    bk, (fan_out,), minval=-bound, maxval=bound, dtype=dtype
                ),
            }
        )
    return {"layers": layers}


def _pallas_available() -> bool:
    """Fused Pallas path only on a real TPU backend (tests run on CPU)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probing
        return False


def apply_mlp(
    params,
    x: jnp.ndarray,
    activation: Callable = jax.nn.relu,
    out_activation: Optional[Callable] = None,
    compute_dtype=None,
    fused: Optional[bool] = None,
) -> jnp.ndarray:
    """Apply the MLP. Hidden activations use `activation`; the output layer
    optionally applies `out_activation`.

    fused=True (default on TPU backends) routes 2-D batches through the
    Pallas fused-chain kernel (ops/pallas/mlp_fused.py): the whole layer
    stack runs in VMEM per sample tile — one HBM read of x, one write of the
    output, activations never spilled (the TPU analogue of tcnn's
    fully-fused MLPs, /root/reference/umhsnerf/umhs_field.py:22).
    """
    if fused is None:
        fused = _pallas_available()
    if fused and activation is jax.nn.relu and x.ndim == 2 and x.shape[0] > 0:
        from .pallas.mlp_fused import mlp_apply_fused

        h = mlp_apply_fused(
            params, x,
            compute_dtype=compute_dtype if compute_dtype is not None
            else jnp.float32,
        )
        return out_activation(h) if out_activation is not None else h
    layers = params["layers"]
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for i, layer in enumerate(layers):
        w = layer["w"] if compute_dtype is None else layer["w"].astype(compute_dtype)
        b = layer["b"] if compute_dtype is None else layer["b"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if i + 1 < len(layers):
            h = activation(h)
            if compute_dtype is not None:
                h = h.astype(compute_dtype)
    if out_activation is not None:
        h = out_activation(h)
    return h
