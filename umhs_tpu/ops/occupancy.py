"""Multi-level binary occupancy grid (EMA density estimator).

TPU-native replacement for nerfacc's `OccGridEstimator` (CUDA), which the
reference builds with roi ±scene_scale, resolution 128, 4 levels
(/root/reference/umhsnerf/umhs_model.py:201-205) and EMA-updates every step
callback via `occ_eval_fn = density_fn(x) * render_step_size`
(umhs_model.py:549-554).

Design: the grid is a plain pytree {occs, binaries} — float EMA densities and
a flattened bool bitfield — updated by jitted XLA ops (scatter + threshold),
and queried inside the ray-march by one gather. Level i covers the roi AABB
with side length scaled by 2^i (nerfacc convention); a position is looked up
in the *finest* level that contains it.

Update schedule matches nerfacc `update_every_n_steps` defaults: every 16
steps; all cells during the first 256 warmup steps, afterwards a uniformly
sampled quarter of cells per level; per-cell value
max(old * ema_decay, occ_eval(x)) with x jittered uniformly inside the cell;
binarisation threshold min(mean(occs), occ_thre).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    resolution: int = 128
    levels: int = 4
    aabb_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    aabb_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    ema_decay: float = 0.95
    occ_thre: float = 0.01
    warmup_steps: int = 256
    update_interval: int = 16
    # max-pool factor for the hierarchical march pre-pass bitfield
    # (0 disables; resolution must be divisible by it)
    pool: int = 0

    @property
    def cells_per_level(self) -> int:
        return self.resolution**3

    @property
    def center(self) -> np.ndarray:
        return (
            np.asarray(self.aabb_min, np.float32) + np.asarray(self.aabb_max, np.float32)
        ) / 2.0

    @property
    def half_extent(self) -> np.ndarray:
        """Half side of the level-0 box."""
        return (
            np.asarray(self.aabb_max, np.float32) - np.asarray(self.aabb_min, np.float32)
        ) / 2.0

    @property
    def max_scale(self) -> float:
        return float(2 ** (self.levels - 1))


def _pool_binaries(binaries: jnp.ndarray, config: OccGridConfig) -> jnp.ndarray:
    """Max-pool the per-level bitfield by config.pool along each axis:
    a supercell is occupied iff any of its pool^3 cells is."""
    p, r, L = config.pool, config.resolution, config.levels
    b = binaries.reshape(L, r // p, p, r // p, p, r // p, p)
    # flat index is x + y*res + z*res^2 -> reshape splits (z, y, x) major
    return jnp.any(b, axis=(2, 4, 6)).reshape(-1)


def init_occ_state(config: OccGridConfig):
    n = config.levels * config.cells_per_level
    state = {
        "occs": jnp.zeros((n,), dtype=jnp.float32),
        "binaries": jnp.zeros((n,), dtype=jnp.bool_),
    }
    if config.pool > 1:
        assert config.resolution % config.pool == 0
        state["binaries_pooled"] = jnp.zeros(
            (config.levels * (config.resolution // config.pool) ** 3,),
            dtype=jnp.bool_,
        )
    return state


def _cell_to_unit(cell_ijk: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Integer cell coords (..., 3) -> unit-cube coords of the cell origin."""
    return cell_ijk.astype(jnp.float32) / resolution


def _flat_to_ijk(flat: jnp.ndarray, resolution: int) -> jnp.ndarray:
    x = flat % resolution
    y = (flat // resolution) % resolution
    z = flat // (resolution * resolution)
    return jnp.stack([x, y, z], axis=-1)


def _level_world_positions(
    config: OccGridConfig,
    level: jnp.ndarray,
    cell_flat: jnp.ndarray,
    jitter: jnp.ndarray,
) -> jnp.ndarray:
    """World position of a jittered point inside (level, cell)."""
    res = config.resolution
    ijk = _flat_to_ijk(cell_flat, res)
    unit = (_cell_to_unit(ijk, res) + jitter / res) * 2.0 - 1.0  # [-1, 1]
    scale = jnp.exp2(level.astype(jnp.float32))[..., None]
    center = jnp.asarray(config.center)
    half = jnp.asarray(config.half_extent)
    return center + unit * half * scale


def query_occupancy(
    binaries: jnp.ndarray,
    positions: jnp.ndarray,
    config: OccGridConfig,
    res: Optional[int] = None,
) -> jnp.ndarray:
    """Occupancy of world positions (..., 3) -> bool (...,).

    Uses the finest level whose box contains the position; positions outside
    the coarsest level are unoccupied. `res` overrides the per-level grid
    resolution — used to query the max-pooled bitfield in the hierarchical
    march pre-pass (binaries must then be the pooled field).
    """
    center = jnp.asarray(config.center)
    half = jnp.asarray(config.half_extent)
    rel = (positions - center) / half  # level-0 normalised coords
    maxc = jnp.max(jnp.abs(rel), axis=-1)
    # finest containing level: smallest l with maxc <= 2^l
    lvl = jnp.ceil(jnp.log2(jnp.maximum(maxc, 1e-12)))
    lvl = jnp.clip(lvl, 0, config.levels - 1).astype(jnp.int32)
    inside = maxc <= config.max_scale

    scale = jnp.exp2(lvl.astype(jnp.float32))[..., None]
    unit = (rel / scale + 1.0) / 2.0  # [0, 1] in that level
    res = config.resolution if res is None else res
    ijk = jnp.clip(jnp.floor(unit * res).astype(jnp.int32), 0, res - 1)
    flat = (
        lvl * (res**3)
        + ijk[..., 0]
        + ijk[..., 1] * res
        + ijk[..., 2] * res * res
    )
    occ = jnp.take(binaries, flat.reshape(-1), axis=0).reshape(flat.shape)
    return occ & inside


def _eval_occ(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    positions: jnp.ndarray,
    chunk: int = 1 << 19,
) -> jnp.ndarray:
    """Chunked density evaluation over (N, 3) positions -> (N,)."""
    n = positions.shape[0]
    chunk = min(chunk, max(1, 1 << (n - 1).bit_length()))
    pad = (-n) % chunk
    padded = jnp.concatenate([positions, jnp.zeros((pad, 3), positions.dtype)], axis=0)
    chunks = padded.reshape(-1, chunk, 3)
    out = jax.lax.map(density_fn, chunks)
    return out.reshape(-1)[:n]


def update_occ_state(
    state,
    config: OccGridConfig,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    render_step_size: float,
    rng: jax.Array,
    full: bool,
    sample_fraction: float = 0.25,
):
    """One EMA update of the grid. `full=True` updates every cell (warmup);
    otherwise a random quarter of cells per level (sampled with replacement,
    matching nerfacc's post-warmup schedule)."""
    res3 = config.cells_per_level
    L = config.levels
    k_jit, k_cells = jax.random.split(rng)

    if full:
        cell_flat = jnp.tile(jnp.arange(res3, dtype=jnp.int32), L)
        level = jnp.repeat(jnp.arange(L, dtype=jnp.int32), res3)
    else:
        # nerfacc _sample_uniform_and_occupied_cells: half uniform cells,
        # half drawn from currently-occupied cells, so stale occupied cells
        # are re-evaluated at the reference rate (pruning-speed parity).
        # Occupied draw: uniform rank in the per-level occupied count,
        # inverted through the running count with searchsorted (static
        # shapes); levels with no occupied cells fall back to uniform.
        m = int(res3 * sample_fraction)
        m_occ = m // 2
        m_uni = m - m_occ
        k_cells, k_fall, k_rank = jax.random.split(k_cells, 3)
        uni = jax.random.randint(k_cells, (L, m_uni), 0, res3, dtype=jnp.int32)
        bin_lvl = state["binaries"].reshape(L, res3)
        cum = jnp.cumsum(bin_lvl.astype(jnp.int32), axis=1)  # (L, res3)
        count = cum[:, -1]  # (L,)
        u = jax.random.uniform(k_rank, (L, m_occ))
        rank = jnp.floor(u * count[:, None].astype(jnp.float32)).astype(jnp.int32)
        occ_idx = jax.vmap(
            lambda c, r: jnp.searchsorted(c, r, side="right")
        )(cum, rank).astype(jnp.int32)
        fallback = jax.random.randint(k_fall, (L, m_occ), 0, res3, dtype=jnp.int32)
        occ_idx = jnp.where(
            count[:, None] > 0, jnp.minimum(occ_idx, res3 - 1), fallback
        )
        cell_flat = jnp.concatenate([uni, occ_idx], axis=1).reshape(-1)
        level = jnp.repeat(jnp.arange(L, dtype=jnp.int32), m)

    jitter = jax.random.uniform(k_jit, (cell_flat.shape[0], 3))
    positions = _level_world_positions(config, level, cell_flat, jitter)
    occ = _eval_occ(density_fn, positions) * render_step_size

    flat_idx = level * res3 + cell_flat
    old = jnp.take(state["occs"], flat_idx, axis=0)
    # defense in depth: a single NaN here would persist forever through the
    # EMA max and silently empty the grid
    new = jnp.maximum(old * config.ema_decay, jnp.nan_to_num(occ))
    occs = state["occs"].at[flat_idx].set(new)

    thre = jnp.minimum(jnp.mean(occs), config.occ_thre)
    binaries = occs > thre
    out = {"occs": occs, "binaries": binaries}
    if config.pool > 1:
        out["binaries_pooled"] = _pool_binaries(binaries, config)
    return out


def occ_update_due(step: int, config: OccGridConfig) -> bool:
    """Host-side schedule check (matches nerfacc update_every_n_steps)."""
    return step % config.update_interval == 0


def mark_all_occupied(state):
    """Fully-occupied grid — used before the first density update so that the
    very first training batches march everywhere (nerfacc grids start empty
    but are updated before the first forward by the BEFORE_TRAIN_ITERATION
    callback; we mirror that by calling update at step 0)."""
    out = {
        "occs": state["occs"],
        "binaries": jnp.ones_like(state["binaries"]),
    }
    if "binaries_pooled" in state:
        out["binaries_pooled"] = jnp.ones_like(state["binaries_pooled"])
    return out
