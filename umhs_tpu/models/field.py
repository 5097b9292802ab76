"""UMHS field: hash-grid density + spectral-unmixing heads, as pure functions.

TPU-native redesign of the reference `UMHSField(NerfactoField)`
(/root/reference/umhsnerf/umhs_field.py:28-329). The torch class hierarchy
(NerfactoField -> tcnn hash MLP + head modules) becomes a flat parameter
pytree and two pure functions:

- `field_density(params, cfg, positions)` — scene contraction -> [0,1]
  normalisation -> hash encoding -> base MLP -> trunc_exp density + geometry
  features (reference get_density, umhs_field.py:300-329).
- `field_outputs(params, cfg, positions, directions, camera_indices,
  geo_feat)` — the spectral unmixing heads (reference get_outputs,
  umhs_field.py:151-296):
    * feature_mlp(posenc, geo_feat) -> per-class logits (+1 specular gate),
      abundances = softmax(logits / temperature)
    * mlp_head(posenc, geo_feat, appearance) -> sigmoid per-class scalars
    * learnable endmember matrix E (num_classes, num_bands), VCA-initialised
    * linear mixing: spec[b] = sum_k scalar[k] * E[k,b] * abundance[k]
    * optional view-dependent specular residual:
      spec2 = spec + s1 * sigmoid(mlp_directional(SH(dir), posenc))
    * optional DINO head from (stop-grad) geometry features.

Everything runs on flat (N, ...) sample batches; the model layer reshapes
(rays, samples) blocks. Heads are tiny MLPs batched over ~1e5-1e6 samples,
which XLA maps onto the MXU as dense GEMMs.

Documented reference quirks preserved: appearance embedding dim is 0 in the
live configuration (the use_appearance_embedding flag is inverted at
umhs_model.py:135,181); at eval the reference uses a zeros appearance vector.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import trunc_exp
from ..ops.encodings import (
    HashEncodingConfig,
    hash_encode,
    init_hash_table,
    nerf_encoding,
    sh_encoding,
)
from ..ops.mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    method: str = "rgb"  # rgb | spectral | rgb+spectral
    num_classes: int = 5
    num_bands: int = 0
    num_images: int = 1
    geo_feat_dim: int = 15
    base_mlp_layers: int = 2
    base_mlp_width: int = 64
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 0
    use_average_appearance_embedding: bool = False
    temperature: float = 0.2
    pred_specular: bool = False
    # Warmup ramp on the specular residual gate: s1 *= clip(step/N, 0, 1)
    # over the first N train steps. Closes a seed-dependent early-training
    # local minimum where the view-dependent residual absorbs the diffuse
    # signal (spectral = spec + s1*specular, reference umhs_field.py:251-258)
    # and training stalls at loss~0.04; see docs/PERFORMANCE.md "Early-training
    # specular trap" and tests/test_train_e2e.py::test_specular_trap_regression.
    # Default 1000 (a deliberate, measured deviation from the reference, which
    # has no ramp and is exposed to the trap); 0 = reference behaviour.
    specular_ramp_steps: int = 1000
    pred_dino: bool = False
    dino_dim: int = 128
    use_scene_contraction: bool = True
    aabb_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    aabb_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    average_init_density: float = 1.0
    hash: HashEncodingConfig = dataclasses.field(default_factory=HashEncodingConfig)
    # positional frequency encoding (NeRFEncoding(2 freqs, exp 0..1))
    posenc_frequencies: int = 2
    sh_levels: int = 4
    compute_dtype: Any = jnp.float32

    @property
    def spectral(self) -> bool:
        return "spectral" in self.method

    @property
    def posenc_dim(self) -> int:
        return 3 * self.posenc_frequencies * 2

    @property
    def sh_dim(self) -> int:
        return self.sh_levels**2


def init_field_params(
    key: jax.Array,
    cfg: FieldConfig,
    endmembers_init: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Initialise the full field parameter pytree.

    endmembers_init: optional (num_classes, num_bands) VCA result; falls back
    to standard normal (reference umhs_field.py:77-88).
    """
    keys = jax.random.split(key, 8)
    params: Dict[str, Any] = {}
    params["hash_table"] = init_hash_table(keys[0], cfg.hash)
    params["mlp_base"] = init_mlp(
        keys[1],
        in_dim=cfg.hash.output_dim,
        num_layers=cfg.base_mlp_layers,
        layer_width=cfg.base_mlp_width,
        out_dim=1 + cfg.geo_feat_dim,
    )
    if cfg.appearance_embedding_dim > 0:
        params["appearance_embedding"] = (
            jax.random.normal(keys[2], (cfg.num_images, cfg.appearance_embedding_dim))
            * 0.1
        )

    if cfg.spectral:
        head_out = cfg.num_classes + 1 if cfg.pred_specular else cfg.num_classes
        params["feature_mlp"] = init_mlp(
            keys[3],
            in_dim=cfg.posenc_dim + cfg.geo_feat_dim,
            num_layers=3,
            layer_width=cfg.hidden_dim_color,
            out_dim=head_out,
        )
        params["mlp_head"] = init_mlp(
            keys[4],
            in_dim=cfg.posenc_dim + cfg.geo_feat_dim + cfg.appearance_embedding_dim,
            num_layers=cfg.num_layers_color,
            layer_width=cfg.hidden_dim_color,
            out_dim=cfg.num_classes,
        )
        params["mlp_directional"] = init_mlp(
            keys[5],
            in_dim=cfg.sh_dim + cfg.posenc_dim,
            num_layers=2,
            layer_width=16,
            out_dim=cfg.num_bands,
        )
        if endmembers_init is not None:
            em = jnp.asarray(endmembers_init, dtype=jnp.float32)
            assert em.shape == (cfg.num_classes, cfg.num_bands), (
                f"endmember init shape {em.shape} != "
                f"({cfg.num_classes}, {cfg.num_bands})"
            )
            params["endmembers"] = em
        else:
            params["endmembers"] = jax.random.normal(
                keys[6], (cfg.num_classes, cfg.num_bands)
            )
        if cfg.pred_dino:
            params["dino_mlp"] = init_mlp(
                keys[7],
                in_dim=cfg.geo_feat_dim,
                num_layers=2,
                layer_width=256,
                out_dim=cfg.dino_dim,
            )
            # Learnable DINO-space cluster centres for the cluster loss
            # (STEGO-style). The reference's ClusterLookup never defines its
            # `self.clusters` attribute (clusterprobe.py:14-15 references a
            # nonexistent tensor), so its dino cluster path would crash at
            # umhs_model.py:321 — the commented experiments at
            # umhs_model.py:215,218 (ClusterLookup(128, ...)) show the
            # intent: dim-128 cluster centres, randn init.
            params["dino_clusters"] = jax.random.normal(
                jax.random.fold_in(keys[7], 1),
                (cfg.num_classes, cfg.dino_dim),
            )
    else:
        # rgb method: mlp_head maps (SH dir, geo feat, appearance) -> rgb
        params["mlp_head"] = init_mlp(
            keys[4],
            in_dim=cfg.sh_dim + cfg.geo_feat_dim + cfg.appearance_embedding_dim,
            num_layers=cfg.num_layers_color,
            layer_width=cfg.hidden_dim_color,
            out_dim=3,
        )
    return params


def scene_contract(positions: jnp.ndarray) -> jnp.ndarray:
    """SceneContraction(order=inf): identity inside the unit inf-ball, else
    (2 - 1/||x||_inf) * x/||x||_inf. Output lies in [-2, 2]^3."""
    norm = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    safe = jnp.maximum(norm, 1e-12)
    contracted = (2.0 - 1.0 / safe) * (positions / safe)
    return jnp.where(norm <= 1.0, positions, contracted)


def normalized_positions(positions: jnp.ndarray, cfg: FieldConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map world positions to the hash grid's [0,1]^3 domain.

    With scene contraction: contract -> (x+2)/4 (reference umhs_field.py:302-305).
    Without: normalise by the scene AABB. Returns (unit_positions, selector)
    where selector marks positions strictly inside (0,1)^3; outside positions
    are zeroed and their density forced to 0 (umhs_field.py:309-310,328).
    """
    if cfg.use_scene_contraction:
        unit = (scene_contract(positions) + 2.0) / 4.0
    else:
        lo = jnp.asarray(cfg.aabb_min)
        hi = jnp.asarray(cfg.aabb_max)
        unit = (positions - lo) / (hi - lo)
    selector = jnp.all((unit > 0.0) & (unit < 1.0), axis=-1)
    unit = unit * selector[..., None]
    return unit, selector


def field_density(
    params, cfg: FieldConfig, positions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Density + geometry features at world positions (..., 3).

    Returns (density (...,), geo_feat (..., geo_feat_dim)).
    """
    unit, selector = normalized_positions(positions, cfg)
    enc = hash_encode(params["hash_table"], unit, cfg.hash)
    h = apply_mlp(params["mlp_base"], enc, compute_dtype=cfg.compute_dtype)
    density_raw = h[..., 0]
    geo_feat = h[..., 1:]
    density = cfg.average_init_density * trunc_exp(density_raw.astype(jnp.float32))
    density = jnp.where(selector, density, 0.0)
    return density, geo_feat


def density_fn(params, cfg: FieldConfig):
    """Closure returning density only — used by the occupancy-grid update
    (reference umhs_model.py:553: occ_eval_fn = density_fn(x) * step)."""

    def fn(positions: jnp.ndarray) -> jnp.ndarray:
        d, _ = field_density(params, cfg, positions)
        return d

    return fn


def _appearance_vector(
    params, cfg: FieldConfig, camera_indices: jnp.ndarray, train: bool, n: int
):
    if cfg.appearance_embedding_dim == 0:
        return None
    table = params["appearance_embedding"]
    if train:
        return jnp.take(table, camera_indices.reshape(-1), axis=0)
    if cfg.use_average_appearance_embedding:
        return jnp.tile(jnp.mean(table, axis=0)[None], (n, 1))
    return jnp.zeros((n, cfg.appearance_embedding_dim), dtype=table.dtype)


def field_outputs(
    params,
    cfg: FieldConfig,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: jnp.ndarray,
    geo_feat: jnp.ndarray,
    train: bool = True,
    step: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Colour/spectral heads at flat sample positions.

    Args:
        positions: (N, 3) world positions (sample midpoints).
        directions: (N, 3) unit view directions.
        camera_indices: (N,) int32 camera index per sample.
        geo_feat: (N, geo_feat_dim) from field_density.
        step: traced train-step counter; only used by the opt-in specular
            warmup ramp (cfg.specular_ramp_steps > 0).

    Returns dict with (per method) keys: 'rgb' | 'spectral', 'spectral2',
    'specular', 'abundances', 'dino'.
    """
    n = positions.shape[0]
    out: Dict[str, jnp.ndarray] = {}
    appearance = _appearance_vector(params, cfg, camera_indices, train, n)

    if cfg.spectral:
        posenc = nerf_encoding(
            positions, num_frequencies=cfg.posenc_frequencies, max_freq_exp=cfg.posenc_frequencies - 1.0
        )
        h1 = jnp.concatenate(
            [posenc, geo_feat] + ([appearance] if appearance is not None else []),
            axis=-1,
        )
        scalar = jax.nn.sigmoid(
            apply_mlp(params["mlp_head"], h1, compute_dtype=cfg.compute_dtype)
        )  # (N, K)

        feat_in = jnp.concatenate([posenc, geo_feat], axis=-1)
        logits = apply_mlp(params["feature_mlp"], feat_in, compute_dtype=cfg.compute_dtype)
        if cfg.pred_specular:
            logits, s1 = logits[..., : cfg.num_classes], logits[..., cfg.num_classes :]
            s1 = jax.nn.sigmoid(s1)  # (N, 1)
            if cfg.specular_ramp_steps > 0 and step is not None:
                # trace-time gated (ramp 0 -> HLO identical to the reference
                # formula): fade the residual in so the diffuse unmixing path
                # fits first. Computed in f32: under a bf16 compute dtype,
                # step/N in s1.dtype would quantise to ~8 mantissa bits.
                ramp = jnp.clip(
                    jnp.asarray(step, jnp.float32) / cfg.specular_ramp_steps,
                    0.0,
                    1.0,
                )
                s1 = s1 * ramp.astype(s1.dtype)
        abundances = jax.nn.softmax(logits / cfg.temperature, axis=-1)  # (N, K)

        endmembers = params["endmembers"]  # (K, B)
        # linear mixing model: spec[n,b] = sum_k a[n,k] * scalar[n,k] * E[k,b]
        spec = jnp.einsum("nk,nk,kb->nb", abundances, scalar, endmembers)

        if cfg.pred_specular:
            d_enc = sh_encoding(directions, cfg.sh_levels)
            spec_in = jnp.concatenate([d_enc, posenc], axis=-1)
            specular = apply_mlp(
                params["mlp_directional"],
                spec_in,
                out_activation=jax.nn.sigmoid,
                compute_dtype=cfg.compute_dtype,
            )  # (N, B)
            residual = s1 * specular
            out["spectral"] = spec + residual
            out["spectral2"] = spec
            out["specular"] = jax.lax.stop_gradient(residual)
        else:
            out["spectral"] = spec
        out["abundances"] = abundances

        if cfg.pred_dino:
            out["dino"] = apply_mlp(
                params["dino_mlp"],
                jax.lax.stop_gradient(geo_feat),
                compute_dtype=cfg.compute_dtype,
            )
    else:
        d_enc = sh_encoding(directions, cfg.sh_levels)
        h = jnp.concatenate(
            [d_enc, geo_feat] + ([appearance] if appearance is not None else []),
            axis=-1,
        )
        # nerfstudio RGB heads end in sigmoid
        out["rgb"] = apply_mlp(
            params["mlp_head"],
            h,
            out_activation=jax.nn.sigmoid,
            compute_dtype=cfg.compute_dtype,
        )
    return out


def init_proposal_params(
    key: jax.Array, hash_cfg: HashEncodingConfig, width: int = 16
) -> Dict[str, Any]:
    """Density-only proposal network (nerfacto-style): small hash grid + a
    2-layer MLP to one density logit."""
    k1, k2 = jax.random.split(key)
    return {
        "hash_table": init_hash_table(k1, hash_cfg),
        "mlp": init_mlp(k2, in_dim=hash_cfg.output_dim, num_layers=2,
                        layer_width=width, out_dim=1),
    }


def proposal_density(
    params, hash_cfg: HashEncodingConfig, field_cfg: FieldConfig,
    positions: jnp.ndarray,
) -> jnp.ndarray:
    """Density of a proposal net at world positions (..., 3) -> (...,).
    Shares the main field's contraction/normalisation."""
    unit, selector = normalized_positions(positions, field_cfg)
    enc = hash_encode(params["hash_table"], unit, hash_cfg)
    raw = apply_mlp(params["mlp"], enc, compute_dtype=field_cfg.compute_dtype)[..., 0]
    density = trunc_exp(raw.astype(jnp.float32))
    return jnp.where(selector, density, 0.0)


def clamp_endmembers(params):
    """AFTER_TRAIN_ITERATION callback: clamp the endmember matrix to [0, 1]
    (reference umhs_model.py:567-572)."""
    if "endmembers" in params:
        params = dict(params)
        params["endmembers"] = jnp.clip(params["endmembers"], 0.0, 1.0)
    return params
