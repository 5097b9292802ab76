"""UMHS model: occupancy-grid NeRF with spectral unmixing, as pure functions.

TPU-native redesign of the reference `UMHSModel(NGPModel)`
(/root/reference/umhsnerf/umhs_model.py:122-620). The torch module becomes a
static `UMHSModel` descriptor (configs + colour system) whose methods are
pure: parameters, occupancy state, rays, and RNG are explicit arguments, so
`forward`/`loss` jit and shard cleanly.

Per-step dataflow (reference get_outputs, umhs_model.py:225-327):
  march rays through the occupancy grid -> field density + heads on the
  padded (rays, samples) block -> distance-squared gradient scaling ->
  transmittance weights -> one fused accumulation pass for spectra (B bands),
  abundances (K), depth and opacity -> spectrum->RGB projection ->
  cosine-similarity segmentation against the endmembers.

Losses (reference get_loss_dict, umhs_model.py:329-383): random-background
blending on RGB only; MSE on spectra *without* background blending; method
selects the combination. Note: the reference hard-codes the 5x spectral
weight in `rgb+spectral` (umhs_model.py:369) and ignores its own
`spectral_loss_weight` config — here the config value is honoured, with a
default of 5.0 so reference behaviour is reproduced out of the box.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compositing import (
    accumulate,
    render_accumulation,
    render_depth_expected,
    render_weights,
    segment_accumulate,
)
from ..ops.encodings import HashEncodingConfig
from ..ops.occupancy import (
    OccGridConfig,
    init_occ_state,
    update_occ_state,
)
from ..ops.proposal_sampling import (
    distortion_loss,
    interlevel_loss,
    pdf_resample,
    sdist_to_t,
    uniform_bins,
)
from ..ops.ray_marching import MarchConfig, march_rays, sample_positions
from ..ops.spec_to_rgb import ColourSystem
from ..utils.clusterprobe import cluster_probe, label_to_rgb
from .field import (
    FieldConfig,
    clamp_endmembers,
    density_fn,
    field_density,
    field_outputs,
    init_field_params,
    init_proposal_params,
    proposal_density,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Mirrors the reference UMHSConfig (umhs_model.py:61-119)."""

    method: str = "rgb"  # rgb | spectral | rgb+spectral
    grid_resolution: int = 128
    grid_levels: int = 4
    max_res: int = 2048
    log2_hashmap_size: int = 19
    # hash-grid shape: rows gathered per sample = num_levels*8; TPU row
    # gathers are width-insensitive up to 8 f32, so fewer levels x wider
    # features (e.g. 8x4) halves gather cost at equal encoding width
    hash_num_levels: int = 16
    hash_features_per_level: int = 2
    # "trilinear" (tcnn parity) or "tetrahedral" (4 simplex vertices —
    # half the table-row gathers per sample; see ops/encodings.py)
    hash_interpolation: str = "trilinear"
    # split the dense coarse hash levels into small-table gather slices
    # (forward-only, bit-identical; see ops/encodings.py)
    hash_split_dense_gather: bool = False
    alpha_thre: float = 0.01
    cone_angle: float = 0.004
    render_step_size: Optional[float] = None
    near_plane: float = 0.05
    far_plane: float = 1.0e3
    use_gradient_scaling: bool = True
    background_color: str = "random"  # random | black | white | last_sample
    disable_scene_contraction: bool = False
    rgb_loss_weight: float = 1.0
    spectral_loss_weight: float = 5.0
    temperature: float = 0.2
    pred_dino: bool = False
    pred_specular: bool = False
    # specular-residual warmup ramp, default ON at 1000 steps (see
    # FieldConfig.specular_ramp_steps; 0 restores exact reference behaviour)
    specular_ramp_steps: int = 1000
    load_vca: bool = False
    eval_num_rays_per_chunk: int = 4096
    # TPU static-shape marching budget (replaces nerfacc's dynamic packing)
    num_candidates: int = 1024
    max_samples_per_ray: int = 96
    occ_subsamples: int = 4  # fine steps per occupancy query (~cell size)
    # warmup full-update thinning (see OccGridConfig.warmup_full_every);
    # 1 = exact nerfacc warmup schedule
    occ_warmup_full_every: int = 1
    # hierarchical march pre-pass: supercell factor for the max-pooled
    # occupancy bitfield (0 disables; grid_resolution must divide by it).
    # Cuts march occupancy-gather rows ~2x at equal coverage.
    march_pool: int = 4
    early_stop_eps: float = 1e-4
    # Approximate early ray termination at march time: drop candidates
    # behind an accumulated optical depth (from the occupancy state's
    # lower-envelope density tracker) above this threshold. DISABLED by
    # default: per-cell scalar bounds cannot soundly bound a ray's od at
    # cell granularity (corner-clipping intervals overcharge without
    # bound) — measured -6.5 dB of rendering quality even with the
    # geometric-rise envelope at od 11.5 (docs/PERFORMANCE.md, round-2
    # lessons). Exact termination is done instead by the staged field
    # evaluation (below), which skips later depth stages once the TRUE
    # transmittance crosses early_stop_eps — nerfacc's sigma_fn-based
    # termination semantics (/root/reference/umhsnerf/umhs_model.py:229-237)
    # at stage granularity. Gated by march_early_stop_warmup when enabled.
    march_early_stop_od: float = 0.0
    march_early_stop_warmup: int = 512
    compute_dtype: str = "float32"  # or "bfloat16"
    stochastic_hash_grad: bool = True  # one-corner gradient splatting
    # Compact-space field evaluation: gather valid samples into a fixed
    # buffer of compact_fraction * R * S slots and run the field only there
    # (the padded (R, S) block is mostly dead lanes after grid convergence).
    # The marcher's global budget guarantees the buffer never overflows.
    compact_samples: bool = True
    compact_fraction: float = 0.5
    # Staged exact early termination (compact path): evaluate the field on
    # the first `stage_samples` depth-ordered lanes, compute the TRUE
    # transmittance, and skip the remaining lanes of rays already below
    # early_stop_eps — nerfacc's sigma_fn termination at stage granularity
    # (/root/reference/umhsnerf/umhs_model.py:229-237). 0 disables staging.
    stage_samples: int = 16
    # Multi-checkpoint staging: explicit ascending lane boundaries replacing
    # the single stage_samples split, e.g. (8, 16) -> three stages [0,8),
    # [8,16), [16,S) with an exact termination check after each. Empty =
    # (stage_samples,). Extra checkpoints terminate rays earlier (fewer
    # field evaluations) at the cost of one more compaction buffer and its
    # gather/scatter per stage. Default (8, 16): measured +40% sustained
    # throughput at equal eval PSNR vs the two-stage split (termination is
    # exact either way; docs/PERFORMANCE.md round-3 table). Boundaries >=
    # the per-ray sample count are dropped, so small-S configs degrade to
    # fewer stages automatically.
    stage_boundaries: Tuple[int, ...] = (8, 16)
    # Sampler family: 'occgrid' (the reference method's nerfacc-style
    # occupancy marching) or 'proposal' (nerfacto-style proposal networks
    # with PDF resampling — no occupancy grid, robust on unbounded scenes).
    sampler: str = "occgrid"
    num_proposal_samples: Tuple[int, int] = (256, 96)
    num_nerf_samples: int = 48
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002


def _grad_scale(x: jnp.ndarray, scaling: jnp.ndarray) -> jnp.ndarray:
    """Identity forward, gradient multiplied by `scaling` backward —
    the reference's scale_gradients_by_distance_squared
    (nerfstudio losses; applied at umhs_model.py:241-242)."""
    return x * scaling + jax.lax.stop_gradient(x * (1.0 - scaling))


class UMHSModel:
    """Static model descriptor; all state flows through function arguments."""

    def __init__(
        self,
        config: ModelConfig,
        wavelengths: Sequence[float],
        num_classes: int,
        num_images: int,
        scene_scale: float = 1.0,
    ):
        self.config = config
        self.wavelengths = list(wavelengths) if wavelengths is not None else []
        self.num_classes = num_classes
        self.num_images = num_images
        aabb_min = (-scene_scale,) * 3
        aabb_max = (scene_scale,) * 3

        if config.render_step_size is None:
            diag = float(np.linalg.norm(np.subtract(aabb_max, aabb_min)))
            render_step_size = diag / 1000.0
        else:
            render_step_size = config.render_step_size
        self.render_step_size = render_step_size

        pool = config.march_pool
        if pool > 1 and config.grid_resolution % pool != 0:
            pool = 0
        self.occ_config = OccGridConfig(
            resolution=config.grid_resolution,
            levels=config.grid_levels,
            aabb_min=aabb_min,
            aabb_max=aabb_max,
            pool=pool,
            warmup_full_every=config.occ_warmup_full_every,
        )
        self.march_config = MarchConfig(
            num_candidates=config.num_candidates,
            num_samples=config.max_samples_per_ray,
            render_step_size=render_step_size,
            cone_angle=config.cone_angle,
            near_plane=config.near_plane,
            far_plane=config.far_plane,
            occ_subsamples=config.occ_subsamples,
            pool=pool,
            early_stop_od=config.march_early_stop_od,
        )
        self.field_config = FieldConfig(
            method=config.method,
            num_classes=num_classes,
            num_bands=len(self.wavelengths) if "spectral" in config.method else 0,
            num_images=num_images,
            temperature=config.temperature,
            pred_specular=config.pred_specular,
            specular_ramp_steps=config.specular_ramp_steps,
            pred_dino=config.pred_dino,
            use_scene_contraction=not config.disable_scene_contraction,
            aabb_min=aabb_min,
            aabb_max=aabb_max,
            hash=HashEncodingConfig(
                num_levels=config.hash_num_levels,
                features_per_level=config.hash_features_per_level,
                log2_hashmap_size=config.log2_hashmap_size,
                max_resolution=config.max_res,
                stochastic_grad=config.stochastic_hash_grad,
                interpolation=config.hash_interpolation,
                split_dense_gather=config.hash_split_dense_gather,
            ),
            compute_dtype=jnp.bfloat16
            if config.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        self.converter = (
            ColourSystem(self.wavelengths) if self.wavelengths else None
        )
        # proposal-net hash configs (nerfacto defaults: tiny 5-level grids)
        self.proposal_hash_configs = (
            HashEncodingConfig(num_levels=5, max_resolution=128,
                               log2_hashmap_size=17, base_resolution=16),
            HashEncodingConfig(num_levels=5, max_resolution=256,
                               log2_hashmap_size=17, base_resolution=16),
        )

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def init(self, key: jax.Array, endmembers_init: Optional[np.ndarray] = None):
        params = init_field_params(key, self.field_config, endmembers_init)
        if self.config.sampler == "proposal":
            for i, hcfg in enumerate(
                self.proposal_hash_configs[: len(self.config.num_proposal_samples)]
            ):
                key, sub = jax.random.split(key)
                params[f"proposal_{i}"] = init_proposal_params(sub, hcfg)
        occ_state = init_occ_state(self.occ_config)
        return params, occ_state

    # ------------------------------------------------------------------
    # occupancy maintenance (BEFORE_TRAIN_ITERATION callback equivalent)
    # ------------------------------------------------------------------
    def update_occupancy(self, occ_state, params, rng: jax.Array, full: bool):
        return update_occ_state(
            occ_state,
            self.occ_config,
            density_fn(params, self.field_config),
            self.render_step_size,
            rng,
            full=full,
        )

    def occ_update_due(self, step: int) -> Tuple[bool, bool]:
        """(due, full_update) per the nerfacc schedule, with optional
        warmup full-update thinning (OccGridConfig.warmup_full_every)."""
        if self.config.sampler == "proposal":
            return False, False
        cfg = self.occ_config
        due = step % cfg.update_interval == 0
        full = step < cfg.warmup_steps and (
            step % (cfg.update_interval * max(cfg.warmup_full_every, 1)) == 0
        )
        return due, full

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def _compact_budget(self, num_rays: int, num_samples: int) -> int:
        """Static compact-buffer size, 256-aligned."""
        b = int(num_rays * num_samples * self.config.compact_fraction)
        return max(256, (b // 256) * 256)

    def active_stage_boundaries(self, num_samples: int) -> Tuple[int, ...]:
        """Staged-termination lane boundaries in effect for a per-ray sample
        count: config.stage_boundaries (else (stage_samples,)), sorted and
        filtered to (0, num_samples). The trainer sizes one compact budget
        per stage (len(bounds)+1) under this same rule, so the forward's
        lane splits and the supplied budget tuple always agree in length."""
        cfg = self.config
        bounds = tuple(cfg.stage_boundaries) or (
            (cfg.stage_samples,) if cfg.stage_samples > 0 else ()
        )
        return tuple(sorted({b for b in bounds if 0 < b < num_samples}))
    def forward(
        self,
        params,
        occ_state: Dict[str, jnp.ndarray],
        rays: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = True,
        march_config: Optional[MarchConfig] = None,
        compact_budget: Optional[int] = None,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render a batch of rays.

        occ_state: occupancy grid state {"occs", "binaries"}.
        rays: {"origins": (R,3), "directions": (R,3), "camera_indices": (R,)}.
        march_config: optional override of the static sample budget — used by
        the trainer's dynamic batch sizing (shrink samples-per-ray once the
        occupancy grid converges, grow the ray batch to compensate).
        Returns per-ray outputs: accumulation, depth, num_samples, and
        rgb / spectral / spectral2 / specular / abundances / seg_* per method.
        """
        cfg = self.config
        if cfg.sampler == "proposal":
            return self._forward_proposal(
                params, rays, rng=rng, train=train, step=step
            )
        march_cfg = march_config or self.march_config
        occ_binaries = occ_state["binaries"]
        # nerfacc semantics: effective alpha threshold is
        # min(config.alpha_thre, mean occupancy) -> no filtering early on.
        alpha_thre = jnp.minimum(cfg.alpha_thre, jnp.mean(occ_state["occs"]))
        o, d = rays["origins"], rays["directions"]
        cam_idx = rays.get(
            "camera_indices", jnp.zeros(o.shape[0], dtype=jnp.int32)
        )
        R = o.shape[0]
        S = march_cfg.num_samples

        compact = cfg.compact_samples
        B = compact_budget or self._compact_budget(R, S)
        # od culling is gated off while the EMA grid is still warming up
        # (max-biased estimates on a half-formed field cull real samples)
        od_val = None
        if step is not None and cfg.march_early_stop_od > 0.0:
            od_val = jnp.where(
                step >= cfg.march_early_stop_warmup,
                cfg.march_early_stop_od,
                jnp.inf,
            )
        march = march_rays(
            occ_binaries,
            self.occ_config,
            march_cfg,
            o,
            d,
            rng=rng if train else None,
            total_budget=(
                (sum(B) if isinstance(B, (tuple, list)) else B)
                if compact
                else None
            ),
            binaries_pooled=occ_state.get("binaries_pooled"),
            # culling uses the LOWER-envelope density (quality-safe: culled
            # samples provably have transmittance < e^-od); absent in old
            # checkpoints -> culling off
            occs=occ_state.get("occs_low"),
            early_stop_od_value=od_val,
            occ_rows=(
                occ_state["occ_rows"].reshape(-1, 2)
                if "occ_rows" in occ_state
                else None
            ),
            pooled_rows=(
                occ_state["pooled_rows"].reshape(-1, 2)
                if "pooled_rows" in occ_state
                else None
            ),
            packed_words=occ_state.get("packed_words"),
        )
        t_starts, t_ends, mask = march["t_starts"], march["t_ends"], march["mask"]
        d_unit = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        positions = sample_positions(o, d, t_starts, t_ends)  # (R, S, 3)

        if compact:
            # --- staged compact-space field evaluation -------------------
            # The padded (R, S) block is mostly masked lanes once the grid
            # converges; valid samples are gathered (ray-major, contiguous
            # per ray) into fixed buffers and the expensive field runs only
            # there. Per-ray reductions are prefix-sum segment sums
            # (scatter-free; compositing.segment_accumulate).
            #
            # EXACT early ray termination, nerfacc's sigma_fn semantics
            # (/root/reference/umhsnerf/umhs_model.py:229-237) at stage
            # granularity: lanes are depth-ordered, so evaluate the first
            # stage_samples lanes, compute the TRUE transmittance after
            # them (same alpha_thre filtering as render_weights), and only
            # rays still above early_stop_eps contribute stage-2 lanes.
            # Terminated rays' tail samples are provably invisible — they
            # are skipped without approximation (unlike od-estimate
            # culling, measured lossy; see docs/PERFORMANCE.md).
            # Staging activates only with EXPLICIT per-stage budgets (the
            # trainer supplies them post-adaptation from measured per-stage
            # occupancy). A single budget keeps the single-stage behaviour:
            # an even lane split of one budget can starve a stage and the
            # overflow clamp then drops samples brutally, where the march's
            # global-budget rescale degrades gracefully (dt-conserving).
            bounds = self.active_stage_boundaries(S)
            if isinstance(B, (tuple, list)) and bounds and len(B) == len(bounds) + 1:
                stage_budgets = [int(b) for b in B]
                edges = (0,) + bounds + (S,)
                lane_splits = list(zip(edges[:-1], edges[1:]))
            else:
                stage_budgets = [sum(B) if isinstance(B, (tuple, list)) else int(B)]
                lane_splits = [(0, S)]

            stage_data = []
            density_parts, mask_parts = [], []
            tmid = (t_starts + t_ends) / 2.0
            live_rays = None  # (R,) bool: still above early_stop_eps
            for (lo, hi), Bs in zip(lane_splits, stage_budgets):
                L = hi - lo
                m = mask[:, lo:hi]
                if live_rays is not None:
                    m = m & live_rays[:, None]
                flat_mask = m.reshape(-1)
                slot = jnp.cumsum(flat_mask.astype(jnp.int32)) - flat_mask.astype(
                    jnp.int32
                )
                # Defensive clamp: drop overflow so the slot->density gather
                # below can never read a wrong compact row; counts/weights
                # are recomputed from the clamped mask.
                flat_mask = flat_mask & (slot < Bs)
                m = flat_mask.reshape(R, L)
                total = jnp.sum(flat_mask.astype(jnp.int32))
                src = (
                    jnp.zeros((Bs,), jnp.int32)
                    .at[jnp.where(flat_mask, slot, Bs)]
                    .set(jnp.arange(R * L, dtype=jnp.int32), mode="drop")
                )
                live = (jnp.arange(Bs) < total).astype(jnp.float32)  # (Bs,)

                pos_c = jnp.take(
                    positions[:, lo:hi].reshape(-1, 3), src, axis=0, mode="clip"
                )
                ray_id = src // L
                dirs_c = jnp.take(d_unit, ray_id, axis=0)
                cam_c = jnp.take(cam_idx, ray_id, axis=0)
                density_c, geo_c = field_density(params, self.field_config, pos_c)
                heads_c = field_outputs(
                    params, self.field_config, pos_c, dirs_c, cam_c, geo_c,
                    train=train, step=step,
                )  # dict of (Bs, C)

                if cfg.use_gradient_scaling:
                    tmid_c = jnp.take(
                        tmid[:, lo:hi].reshape(-1), src, axis=0
                    )
                    scaling_c = jnp.clip(tmid_c**2, 0.0, 1.0)
                    density_c = _grad_scale(density_c, scaling_c)
                    heads_c = {
                        k: _grad_scale(v, scaling_c[..., None])
                        for k, v in heads_c.items()
                    }

                # transmittance needs the (R, L) layout: gather density back
                # via the slot map. mode="clip": jnp.take's default fill
                # mode writes NaN for out-of-bounds — silent poison if
                # budgets ever disagree.
                density_l = jnp.where(
                    m,
                    jnp.take(density_c, slot.reshape(R, L), axis=0, mode="clip"),
                    0.0,
                )
                density_parts.append(density_l)
                mask_parts.append(m)
                counts = jnp.sum(m.astype(jnp.int32), axis=-1)  # (R,)
                starts = jnp.cumsum(counts) - counts
                stage_data.append(
                    {"src": src, "live": live, "heads": heads_c,
                     "counts": counts, "starts": starts, "lo": lo, "hi": hi}
                )

                if hi < S:
                    # exact per-ray transmittance after this stage, with the
                    # same alpha_thre filtering render_weights applies
                    delta = jnp.maximum(t_ends[:, lo:hi] - t_starts[:, lo:hi], 0.0)
                    sd = jnp.where(m, density_l * delta, 0.0)
                    al = 1.0 - jnp.exp(-sd)
                    keep = jax.lax.stop_gradient(al) >= alpha_thre
                    od_stage = jnp.sum(jnp.where(keep, sd, 0.0), axis=-1)
                    od_so_far = (
                        od_stage if live_rays is None
                        else od_stage + od_prev  # noqa: F821
                    )
                    od_prev = jax.lax.stop_gradient(od_so_far)
                    live_rays = od_prev < -np.log(
                        max(cfg.early_stop_eps, 1e-30)
                    )

            mask = jnp.concatenate(mask_parts, axis=1)
            density_rs = jnp.concatenate(density_parts, axis=1)
            weights = render_weights(
                t_starts, t_ends, density_rs, mask,
                alpha_thre=alpha_thre, early_stop_eps=cfg.early_stop_eps,
            )
            for sd_ in stage_data:
                w_st = (
                    jnp.take(
                        weights[:, sd_["lo"]:sd_["hi"]].reshape(-1),
                        sd_["src"], axis=0, mode="clip",
                    )
                    * sd_["live"]
                )
                sd_["w"] = w_st
                sd_["w_sg"] = jax.lax.stop_gradient(w_st)

            def accumulate_fn(key):
                return sum(
                    segment_accumulate(
                        sd_["w"][:, None] * sd_["heads"][key],
                        sd_["starts"], sd_["counts"],
                    )
                    for sd_ in stage_data
                )

            def accumulate_sg(key):
                # stop-grad on the WEIGHTS only: values keep their gradient
                # (the dino head trains through this path)
                return sum(
                    segment_accumulate(
                        sd_["w_sg"][:, None] * sd_["heads"][key],
                        sd_["starts"], sd_["counts"],
                    )
                    for sd_ in stage_data
                )

            num_eval_stages = [
                jnp.sum(mp.astype(jnp.int32), axis=-1) for mp in mask_parts
            ]
        else:
            flat_pos = positions.reshape(-1, 3)
            density, geo_feat = field_density(params, self.field_config, flat_pos)
            density = density.reshape(R, S)
            flat_dirs = jnp.broadcast_to(d_unit[:, None, :], (R, S, 3)).reshape(-1, 3)
            flat_cam = jnp.broadcast_to(cam_idx[:, None], (R, S)).reshape(-1)
            heads = field_outputs(
                params, self.field_config, flat_pos, flat_dirs, flat_cam,
                geo_feat, train=train, step=step,
            )
            heads = {k: v.reshape(R, S, -1) for k, v in heads.items()}

            if cfg.use_gradient_scaling:
                # gradients scaled by clamp(midpoint^2, 0, 1)
                scaling = jnp.clip(((t_starts + t_ends) / 2.0) ** 2, 0.0, 1.0)
                density = _grad_scale(density, scaling)
                heads = {
                    k: _grad_scale(v, scaling[..., None]) for k, v in heads.items()
                }

            weights = render_weights(
                t_starts, t_ends, density, mask,
                alpha_thre=alpha_thre, early_stop_eps=cfg.early_stop_eps,
            )
            accumulate_fn = lambda key: accumulate(weights, heads[key])
            accumulate_sg = lambda key: accumulate(
                jax.lax.stop_gradient(weights), heads[key]
            )
            num_eval_stages = [jnp.sum(mask.astype(jnp.int32), axis=-1)]

        outputs: Dict[str, jnp.ndarray] = {
            "accumulation": render_accumulation(weights),
            "depth": render_depth_expected(weights, t_starts, t_ends, mask),
            "num_samples_per_ray": march["num_samples"],
            "num_occupied_per_ray": march["num_occupied"],
            # field evaluations actually performed per stage (staged exact
            # termination skips provably-invisible tails) — the trainer
            # sizes the stage budgets and R from these
            "num_eval_s1_per_ray": num_eval_stages[0],
            "num_eval_s2_per_ray": (
                num_eval_stages[1]
                if len(num_eval_stages) > 1
                else jnp.zeros_like(num_eval_stages[0])
            ),
        }
        for i, ne in enumerate(num_eval_stages[2:], start=3):
            outputs[f"num_eval_s{i}_per_ray"] = ne

        if cfg.method == "rgb":
            outputs["rgb"] = accumulate_fn("rgb")

        if "spectral" in cfg.method:
            spectral = accumulate_fn("spectral")
            outputs["spectral"] = spectral
            if cfg.pred_specular:
                outputs["spectral2"] = accumulate_fn("spectral2")
                outputs["specular"] = jax.lax.stop_gradient(
                    accumulate_fn("specular")
                )
            # pseudo-RGB via the CIE projection; detached for spectral-only
            rgb = self.converter(spectral)
            outputs["rgb"] = (
                jax.lax.stop_gradient(rgb) if cfg.method == "spectral" else rgb
            )
            outputs["abundances"] = jax.lax.stop_gradient(
                accumulate_fn("abundances")
            )

            # unsupervised material segmentation against the endmembers
            inner_products, cluster_probs = cluster_probe(
                spectral, params["endmembers"], alpha=0.2
            )
            acc_if = (outputs["accumulation"] > 0.5).astype(jnp.float32)
            outputs["seg_probs"] = cluster_probs
            labels = jnp.argmax(cluster_probs, axis=1)
            outputs["seg_raw"] = jax.lax.stop_gradient(
                labels.astype(jnp.float32) * acc_if[:, 0]
            )
            outputs["seg_pred"] = jax.lax.stop_gradient(
                label_to_rgb(labels) * acc_if
            )

            if cfg.pred_dino:
                outputs["dino"] = accumulate_sg("dino")
                # probe against the learnable DINO-space cluster centres
                # (reference umhs_model.py:316-325; with the detached
                # features and alpha=None one-hot probs, the cluster loss
                # reduces to a spherical k-means update of the centres)
                ip_d, probs_d = cluster_probe(
                    jax.lax.stop_gradient(outputs["dino"]),
                    params["dino_clusters"],
                    alpha=None,
                )
                outputs["cluster_probs"] = probs_d
                outputs["inner_products"] = ip_d
        return outputs

    def _forward_proposal(
        self,
        params,
        rays: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = True,
        step: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """nerfacto-style forward: uniform s-bins -> proposal nets with PDF
        resampling -> main field on the final bins. All shapes static; bins
        live in s-space (uniform-in-disparity warp between near and far)."""
        cfg = self.config
        o, d = rays["origins"], rays["directions"]
        d_unit = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        cam_idx = rays.get("camera_indices", jnp.zeros(o.shape[0], dtype=jnp.int32))
        R = o.shape[0]
        near, far = cfg.near_plane, cfg.far_plane
        keys = (
            jax.random.split(rng, len(cfg.num_proposal_samples) + 1)
            if rng is not None
            else [None] * (len(cfg.num_proposal_samples) + 1)
        )

        def bins_to_weights(s_edges, sigma_fn):
            t_edges = sdist_to_t(s_edges, near, far)
            t_lo, t_hi = t_edges[:, :-1], t_edges[:, 1:]
            mids = (t_lo + t_hi) / 2.0
            pos = o[:, None, :] + d_unit[:, None, :] * mids[..., None]
            sigma = sigma_fn(pos.reshape(-1, 3)).reshape(t_lo.shape)
            full = jnp.ones_like(t_lo, dtype=bool)
            w = render_weights(t_lo, t_hi, sigma, full, alpha_thre=0.0,
                               early_stop_eps=0.0)
            return w, t_edges, pos, sigma

        aux_edges, aux_weights = [], []
        s_edges = uniform_bins(R, cfg.num_proposal_samples[0], rng=keys[0])
        for i, n_next in enumerate(
            list(cfg.num_proposal_samples[1:]) + [cfg.num_nerf_samples]
        ):
            hcfg = self.proposal_hash_configs[i]
            w, _, _, _ = bins_to_weights(
                s_edges,
                lambda x, i=i, hcfg=hcfg: proposal_density(
                    params[f"proposal_{i}"], hcfg, self.field_config, x
                ),
            )
            aux_edges.append(s_edges)
            aux_weights.append(w)
            s_edges = pdf_resample(s_edges, w, n_next, rng=keys[i + 1])

        # main field on the final bins (padded path: every lane is valid)
        S = cfg.num_nerf_samples
        t_edges = sdist_to_t(s_edges, near, far)
        t_starts, t_ends = t_edges[:, :-1], t_edges[:, 1:]
        mask = jnp.ones_like(t_starts, dtype=bool)
        positions = o[:, None, :] + d_unit[:, None, :] * (
            (t_starts + t_ends) / 2.0
        )[..., None]
        flat_pos = positions.reshape(-1, 3)
        density, geo_feat = field_density(params, self.field_config, flat_pos)
        density = density.reshape(R, S)
        flat_dirs = jnp.broadcast_to(d_unit[:, None, :], (R, S, 3)).reshape(-1, 3)
        flat_cam = jnp.broadcast_to(cam_idx[:, None], (R, S)).reshape(-1)
        heads = field_outputs(
            params, self.field_config, flat_pos, flat_dirs, flat_cam,
            geo_feat, train=train, step=step,
        )
        heads = {k: v.reshape(R, S, -1) for k, v in heads.items()}
        if cfg.use_gradient_scaling:
            scaling = jnp.clip(((t_starts + t_ends) / 2.0) ** 2, 0.0, 1.0)
            density = _grad_scale(density, scaling)
            heads = {k: _grad_scale(v, scaling[..., None]) for k, v in heads.items()}
        weights = render_weights(t_starts, t_ends, density, mask,
                                 alpha_thre=0.0, early_stop_eps=0.0)

        outputs: Dict[str, jnp.ndarray] = {
            "accumulation": render_accumulation(weights),
            "depth": render_depth_expected(weights, t_starts, t_ends, mask),
            "num_samples_per_ray": jnp.full((R,), S, dtype=jnp.int32),
        }
        if cfg.method == "rgb":
            outputs["rgb"] = accumulate(weights, heads["rgb"])
        if "spectral" in cfg.method:
            spectral = accumulate(weights, heads["spectral"])
            outputs["spectral"] = spectral
            if cfg.pred_specular:
                outputs["spectral2"] = accumulate(weights, heads["spectral2"])
                outputs["specular"] = jax.lax.stop_gradient(
                    accumulate(weights, heads["specular"])
                )
            rgb = self.converter(spectral)
            outputs["rgb"] = (
                jax.lax.stop_gradient(rgb) if cfg.method == "spectral" else rgb
            )
            outputs["abundances"] = jax.lax.stop_gradient(
                accumulate(weights, heads["abundances"])
            )
            inner_products, cluster_probs = cluster_probe(
                spectral, params["endmembers"], alpha=0.2
            )
            acc_if = (outputs["accumulation"] > 0.5).astype(jnp.float32)
            outputs["seg_probs"] = cluster_probs
            labels = jnp.argmax(cluster_probs, axis=1)
            outputs["seg_raw"] = jax.lax.stop_gradient(
                labels.astype(jnp.float32) * acc_if[:, 0]
            )
            outputs["seg_pred"] = jax.lax.stop_gradient(label_to_rgb(labels) * acc_if)

            if cfg.pred_dino:
                outputs["dino"] = accumulate(
                    jax.lax.stop_gradient(weights), heads["dino"]
                )
                ip_d, probs_d = cluster_probe(
                    jax.lax.stop_gradient(outputs["dino"]),
                    params["dino_clusters"],
                    alpha=None,
                )
                outputs["cluster_probs"] = probs_d
                outputs["inner_products"] = ip_d

        if train:
            # proposal supervision aux for the loss (s-space histograms)
            for i, (e, w) in enumerate(zip(aux_edges, aux_weights)):
                outputs[f"prop_edges_{i}"] = e
                outputs[f"prop_weights_{i}"] = w
            outputs["final_edges"] = s_edges
            outputs["final_weights"] = weights
        return outputs

    # ------------------------------------------------------------------
    # losses / metrics
    # ------------------------------------------------------------------
    def loss(
        self,
        outputs: Dict[str, jnp.ndarray],
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        step: int = 0,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        loss_dict: Dict[str, jnp.ndarray] = {}
        image = batch["image"]

        pred_rgb, gt_rgb = self._blend_background_for_loss(
            outputs["rgb"], outputs["accumulation"], image, rng
        )

        if cfg.method == "rgb":
            loss_dict["rgb_loss"] = jnp.mean((pred_rgb - gt_rgb) ** 2)
        elif cfg.method == "spectral":
            loss_dict["spectral_loss"] = jnp.mean(
                (outputs["spectral"] - batch["hs_image"]) ** 2
            )
        elif cfg.method == "rgb+spectral":
            loss_dict["spectral_loss"] = cfg.spectral_loss_weight * jnp.mean(
                (outputs["spectral"] - batch["hs_image"]) ** 2
            )
            loss_dict["rgb_loss"] = cfg.rgb_loss_weight * jnp.mean(
                (pred_rgb - gt_rgb) ** 2
            )
        else:
            raise ValueError(f"unknown method {cfg.method}")

        if "final_edges" in outputs:
            il = sum(
                interlevel_loss(
                    outputs[f"prop_edges_{i}"],
                    outputs[f"prop_weights_{i}"],
                    outputs["final_edges"],
                    outputs["final_weights"],
                )
                for i in range(len(cfg.num_proposal_samples))
            )
            loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * il
            loss_dict["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
                outputs["final_edges"], outputs["final_weights"]
            )

        if cfg.pred_dino and "dino_feat" in batch:
            diff = (outputs["dino"] - batch["dino_feat"]) ** 2
            loss_dict["dino_mse"] = jnp.nanmean(diff)
            # `step` is a traced int32 inside the jitted/scanned train step —
            # gate the cluster loss with a traced 0/1 weight, not Python
            # control flow (reference enables it after step 3000,
            # umhs_model.py:376-381).
            cluster_w = jnp.where(jnp.asarray(step) > 3000, 1.0, 0.0)
            loss_dict["cluster_loss"] = cluster_w * -jnp.mean(
                jnp.sum(outputs["cluster_probs"] * outputs["inner_products"], axis=1)
            )
        return loss_dict

    def _blend_background_for_loss(self, pred_rgb, accumulation, gt_image, rng):
        """Random-background blending (reference SpectralRenderer
        .blend_background_for_loss_computation, umhs_renderer.py:89-114):
        pred += bg * (1 - acc); RGBA ground truth composited over the same bg."""
        cfg = self.config
        gt_rgb = gt_image[..., :3]
        opacity = gt_image[..., 3:4] if gt_image.shape[-1] == 4 else None

        if cfg.background_color == "random":
            bg = jax.random.uniform(rng, pred_rgb.shape, dtype=pred_rgb.dtype)
            pred_rgb = pred_rgb + bg * (1.0 - accumulation)
        elif cfg.background_color == "white":
            bg = jnp.ones_like(pred_rgb)
            pred_rgb = pred_rgb + bg * (1.0 - accumulation)
        else:  # black / last_sample -> no blending on pred, black for GT
            bg = jnp.zeros_like(pred_rgb)
        if opacity is not None:
            gt_rgb = gt_rgb * opacity + bg * (1.0 - opacity)
        return pred_rgb, gt_rgb

    def blend_background(self, image: jnp.ndarray) -> jnp.ndarray:
        """Blend an RGBA ground-truth image over black (metrics path;
        'random'/'last_sample' degrade to black as in the reference)."""
        if image.shape[-1] < 4:
            return image
        rgb, opacity = image[..., :3], image[..., 3:4]
        if self.config.background_color == "white":
            return rgb * opacity + (1.0 - opacity)
        return rgb * opacity

    def metrics(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        gt_rgb = self.blend_background(batch["image"])
        pred_rgb = outputs["rgb"]
        mse = jnp.mean((pred_rgb - gt_rgb) ** 2)
        m = {
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            "rmse": jnp.sqrt(mse),
            "num_samples_per_batch": jnp.sum(outputs["num_samples_per_ray"]),
        }
        if "num_occupied_per_ray" in outputs:
            # tail statistic for the trainer's dynamic S sizing
            m["num_occupied_p99"] = jnp.percentile(
                outputs["num_occupied_per_ray"].astype(jnp.float32), 99.0
            )
        i = 1
        while f"num_eval_s{i}_per_ray" in outputs:
            m[f"num_eval_s{i}_per_batch"] = jnp.sum(
                outputs[f"num_eval_s{i}_per_ray"]
            )
            i += 1
        if "spectral" in self.config.method and "hs_image" in batch:
            mse_s = jnp.mean((outputs["spectral"] - batch["hs_image"]) ** 2)
            m["psnr_spectral"] = -10.0 * jnp.log10(jnp.maximum(mse_s, 1e-12))
            m["rmse_spectral"] = jnp.sqrt(mse_s)
        return m

    @staticmethod
    def post_step(params):
        """AFTER_TRAIN_ITERATION: clamp endmembers to [0,1]."""
        return clamp_endmembers(params)
