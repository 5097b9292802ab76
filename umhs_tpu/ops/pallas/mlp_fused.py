"""Pallas TPU kernel: fused multi-layer MLP over sample tiles.

The reference's heads are tiny MLPs (16-64 wide, 2-3 layers) batched over
1e5-1e6 ray samples (/root/reference/umhsnerf/umhs_field.py:63-113, run via
tcnn's fully-fused CUDA MLPs when implementation=tcnn). XLA lowers each
layer as a separate HBM-round-trip GEMM; this kernel keeps the whole chain
in VMEM per tile of samples — one read of x, one write of y, all hidden
activations on-chip — and a custom VJP whose backward kernel recomputes the
forward per tile (activations never hit HBM) and accumulates dW/db across
the sequential TPU grid.

Math matches ops/mlp.apply_mlp exactly: bf16 inputs to the MXU, f32
accumulation, ReLU between layers, no output activation (callers apply
sigmoid etc. outside — XLA fuses it into the kernel's output).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def _wb_flat(params) -> Tuple[jnp.ndarray, ...]:
    """Flatten layer dicts into (w0, b0, w1, b1, ...)."""
    out = []
    for layer in params["layers"]:
        out.append(layer["w"])
        out.append(layer["b"].reshape(1, -1))  # 2-D for TPU tiling
    return tuple(out)


def _fwd_kernel(compute_dtype, num_layers, x_ref, *refs):
    out_ref = refs[-1]
    wb = refs[:-1]
    h = x_ref[:].astype(compute_dtype)
    for i in range(num_layers):
        w = wb[2 * i][:].astype(compute_dtype)
        b = wb[2 * i + 1][:].astype(jnp.float32)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i + 1 < num_layers:
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    out_ref[:] = h


def _bwd_kernel(compute_dtype, num_layers, x_ref, g_ref, *refs):
    """Recompute forward activations in VMEM, then backprop the chain.

    Outputs: dx tile + dW/db accumulators (constant index_map — the TPU grid
    is sequential, so += across grid steps is well-defined)."""
    wb = refs[:2 * num_layers]
    dx_ref = refs[2 * num_layers]
    dwb = refs[2 * num_layers + 1:]

    # forward recompute, keeping inputs of every layer
    acts = []
    h = x_ref[:].astype(compute_dtype)
    for i in range(num_layers):
        acts.append(h)
        w = wb[2 * i][:].astype(compute_dtype)
        b = wb[2 * i + 1][:].astype(jnp.float32)
        pre = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i + 1 < num_layers:
            h = jnp.maximum(pre, 0.0).astype(compute_dtype)
        else:
            h = pre

    first = pl.program_id(0) == 0
    dh = g_ref[:].astype(jnp.float32)
    for i in reversed(range(num_layers)):
        if i + 1 < num_layers:
            # dh currently refers to post-ReLU input of layer i+1; gate it
            # by the ReLU mask of layer i's pre-activation (acts[i+1] > 0).
            # Compare in f32: Mosaic on v5e rejects bf16 cmpf vectors.
            dh = dh * (acts[i + 1].astype(jnp.float32) > 0.0).astype(jnp.float32)
        a = acts[i]
        dw = jax.lax.dot_general(
            a.astype(compute_dtype), dh.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(dh, axis=0, keepdims=True)

        @pl.when(first)
        def _(i=i, dw=dw, db=db):
            dwb[2 * i][:] = dw
            dwb[2 * i + 1][:] = db

        @pl.when(jnp.logical_not(first))
        def _(i=i, dw=dw, db=db):
            dwb[2 * i][:] = dwb[2 * i][:] + dw
            dwb[2 * i + 1][:] = dwb[2 * i + 1][:] + db

        dh = jnp.dot(
            dh.astype(compute_dtype),
            wb[2 * i][:].astype(compute_dtype).T,
            preferred_element_type=jnp.float32,
        )
    dx_ref[:] = dh


def _pad_rows(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _mlp_fused(wb, x, dims, compute_dtype):
    return _mlp_fused_fwd_only(wb, x, dims, compute_dtype)


def _mlp_fused_fwd_only(wb, x, dims, compute_dtype):
    num_layers = len(dims) - 1
    n = x.shape[0]
    xp = _pad_rows(x, TILE)
    grid = xp.shape[0] // TILE
    const = lambda j: (0, 0)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype, num_layers),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], dims[-1]), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, dims[0]), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
            for w in wb
        ],
        out_specs=pl.BlockSpec((TILE, dims[-1]), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
    )(xp, *wb)
    return out[:n]


def _mlp_fused_vjp_fwd(wb, x, dims, compute_dtype):
    return _mlp_fused_fwd_only(wb, x, dims, compute_dtype), (wb, x)


def _mlp_fused_vjp_bwd(dims, compute_dtype, res, g):
    wb, x = res
    num_layers = len(dims) - 1
    n = x.shape[0]
    xp = _pad_rows(x, TILE)
    gp = _pad_rows(g.astype(jnp.float32), TILE)
    grid = xp.shape[0] // TILE
    const = lambda j: (0, 0)
    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], dims[0]), jnp.float32)] + [
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wb
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype, num_layers),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, dims[0]), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, dims[-1]), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM) for w in wb],
        out_specs=tuple(
            [pl.BlockSpec((TILE, dims[0]), lambda j: (j, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
               for w in wb]
        ),
    )(xp, gp, *wb)
    dx = outs[0][:n].astype(x.dtype)
    dwb = tuple(
        d.astype(w.dtype) if d.shape == w.shape else d.astype(w.dtype)
        for d, w in zip(outs[1:], wb)
    )
    return dwb, dx


_mlp_fused.defvjp(_mlp_fused_vjp_fwd, _mlp_fused_vjp_bwd)


def mlp_apply_fused(params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused-MLP forward matching ops/mlp.apply_mlp (ReLU hidden, linear
    output; apply any output activation on the result). x: (N, in_dim)."""
    wb = _wb_flat(params)
    dims = tuple([wb[0].shape[0]] + [w.shape[1] for w in wb[0::2]])
    return _mlp_fused(wb, x, dims, compute_dtype)
