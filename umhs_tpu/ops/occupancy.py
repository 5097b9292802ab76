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
    # During warmup nerfacc runs a FULL update (every cell, every level) at
    # every due step — 16 of them at the defaults, and each full map over
    # res^3 x levels cells costs ~7.3 s on-TPU at the reference 128^3 x 4
    # config (docs/PERFORMANCE.md round 4): ~117 s of every cold start.
    # warmup_full_every=k keeps every k-th due update full and demotes the
    # rest to the (cheap, sampled) partial update — the EMA still sees every
    # cell at k x the interval, and the partial updates keep refreshing the
    # sampled subset in between. 1 = exact nerfacc warmup semantics.
    warmup_full_every: int = 1
    # Post-warmup cell-sampling fractions: nerfacc samples res^3/4 cells on
    # EVERY level each update (_sample_uniform_and_occupied_cells). The
    # density evals behind that are the single largest amortised train cost
    # on TPU (levels * res^3/4 hash encodes per update), and the outer
    # cascades (levels >= 1: 2x/4x/8x larger boxes, mostly empty background)
    # change far more slowly than the level-0 box the scene lives in. So
    # level 0 keeps the nerfacc rate and outer levels sample at a quarter of
    # it — a documented TPU-native deviation (outer-level pruning responds
    # ~4x slower; level-0 parity exact).
    sample_fraction: float = 0.25
    outer_sample_fraction: float = 0.0625
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


def _pack_supercell_words(binaries: jnp.ndarray, config: OccGridConfig) -> jnp.ndarray:
    """Pack each 4^3-cell supercell's occupancy into one 64-bit word,
    stored as a flat (L * (r/4)^3 * 2,) uint32 array ([lo, hi] halves).

    Bit b = sx + 4*sy + 16*sz for cell (sx, sy, sz) inside the supercell
    (same x-minor order as the flat cell index). The march's hot fine-stage
    occupancy query gathers ONE 8-byte row per candidate from this ~1 MB
    table (small-table gather fast path, ~30% cheaper per row than the
    67 MB full-resolution row table — docs/PERFORMANCE.md cost model) and
    tests the bit on the VPU; results are bit-identical to querying
    `binaries` directly.
    """
    r, L = config.resolution, config.levels
    r4 = r // 4
    # NOTE on form: the obvious 7-D transpose
    # (L,Z,sz,Y,sy,X,sx) -> (L,Z,Y,X,sz,sy,sx) + bit-matmul compiles
    # catastrophically on TPU (measured +350 s of XLA backend compile for
    # the enclosing occupancy update — it dominated the whole train-loop
    # compile budget). 64 strided slices + shifted ORs produce the same
    # words with trivial compile cost and negligible runtime.
    b = binaries.reshape(L, r4, 4, r4, 4, r4, 4)  # (L, Z, sz, Y, sy, X, sx)
    lo = jnp.zeros((L, r4, r4, r4), dtype=jnp.uint32)
    hi = jnp.zeros((L, r4, r4, r4), dtype=jnp.uint32)
    for sz in range(4):
        for sy in range(4):
            for sx in range(4):
                bit = sx + 4 * sy + 16 * sz  # x-minor, same as cell index
                v = b[:, :, sz, :, sy, :, sx].astype(jnp.uint32) << (bit & 31)
                if bit < 32:
                    lo = lo | v
                else:
                    hi = hi | v
    words = jnp.stack([lo, hi], axis=-1)  # (L, Z, Y, X, 2)
    return words.reshape(-1)  # FLAT: 2-wide carries tile-pad (see init)


def init_occ_state(config: OccGridConfig):
    n = config.levels * config.cells_per_level
    state = {
        "occs": jnp.zeros((n,), dtype=jnp.float32),
        # lower-envelope density tracker (fast-down / slow-up EMA of the
        # same probes): a per-cell LOWER bound on density*step, used by the
        # march's early ray termination. Culling on a lower bound is
        # quality-safe: od_low > thre implies od_true > thre implies the
        # culled sample's transmittance is certainly below e^-thre. The
        # max-biased `occs` (nerfacc semantics, used for binarisation)
        # over-culls grazing rays through boundary cells by orders of
        # magnitude; the lower envelope stays ~0 there (probes hit the
        # empty side) while rising to the interior density inside solid
        # objects — exactly where termination is valid.
        "occs_low": jnp.zeros((n,), dtype=jnp.float32),
        "binaries": jnp.zeros((n,), dtype=jnp.bool_),
        # [occupancy 0/1, lower-envelope density] row table for the march's
        # hot queries (8-byte row gathers are ~1.8x cheaper than width-1).
        # Stored FLAT: a (T, 2) array in a scan/fori carry gets tile-padded
        # to 128 lanes (gigabytes of copies — the same landmine as the hash
        # table); consumers reshape(-1, 2) at the gather, which XLA fuses.
        "occ_rows": jnp.zeros((n * 2,), dtype=jnp.float32),
    }
    if config.pool > 1:
        assert config.resolution % config.pool == 0
        np_ = config.levels * (config.resolution // config.pool) ** 3
        state["binaries_pooled"] = jnp.zeros((np_,), dtype=jnp.bool_)
        state["pooled_rows"] = jnp.zeros((np_ * 2,), dtype=jnp.float32)
    if config.resolution % 4 == 0:
        ns = config.levels * (config.resolution // 4) ** 3
        state["packed_words"] = jnp.zeros((ns * 2,), dtype=jnp.uint32)
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


def query_grid_values(
    grid: jnp.ndarray,
    positions: jnp.ndarray,
    config: OccGridConfig,
    res: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-level grid lookup of world positions (..., 3) -> (values, inside).

    Uses the finest level whose box contains the position; `inside` is False
    outside the coarsest level. Works for the bool bitfield and for the
    float EMA `occs` values alike. `res` overrides the per-level grid
    resolution — used to query the max-pooled bitfield in the hierarchical
    march pre-pass (grid must then be the pooled field).
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
    # fusion break: fusing the (log2/exp2-heavy) index computation into the
    # gather operand slows the gather op itself on TPU (see
    # ops/encodings._hash_encode_impl; measured ~1.5x there)
    flat = jax.lax.optimization_barrier(flat)
    if grid.ndim == 2:
        # row-table variant: width-1 gathers cost 8.2 ns/row on TPU vs
        # 4.3-5.3 ns for 8-byte rows, so hot queries pack the per-cell
        # values as (T, 2) f32 rows (see occ_rows below)
        vals = jnp.take(grid, flat.reshape(-1), axis=0, mode="clip").reshape(
            *flat.shape, grid.shape[1]
        )
    else:
        vals = jnp.take(grid, flat.reshape(-1), axis=0).reshape(flat.shape)
    return vals, inside


def query_occupancy(
    binaries: jnp.ndarray,
    positions: jnp.ndarray,
    config: OccGridConfig,
    res: Optional[int] = None,
) -> jnp.ndarray:
    """Occupancy of world positions (..., 3) -> bool (...,)."""
    occ, inside = query_grid_values(binaries, positions, config, res=res)
    return occ & inside


def _packed_cell_index(positions: jnp.ndarray, config: OccGridConfig):
    """(flat supercell row index, bit index 0..63, inside) of world positions
    at CELL resolution — the packed-word analogue of query_grid_values'
    index math (identical level selection / clipping)."""
    center = jnp.asarray(config.center)
    half = jnp.asarray(config.half_extent)
    rel = (positions - center) / half
    maxc = jnp.max(jnp.abs(rel), axis=-1)
    lvl = jnp.ceil(jnp.log2(jnp.maximum(maxc, 1e-12)))
    lvl = jnp.clip(lvl, 0, config.levels - 1).astype(jnp.int32)
    inside = maxc <= config.max_scale

    scale = jnp.exp2(lvl.astype(jnp.float32))[..., None]
    unit = (rel / scale + 1.0) / 2.0
    res = config.resolution
    r4 = res // 4
    ijk = jnp.clip(jnp.floor(unit * res).astype(jnp.int32), 0, res - 1)
    sc = ijk >> 2  # supercell coords
    sub = ijk & 3  # cell-within-supercell coords
    flat = (
        lvl * (r4**3)
        + sc[..., 0]
        + sc[..., 1] * r4
        + sc[..., 2] * r4 * r4
    )
    bit = sub[..., 0] + (sub[..., 1] << 2) + (sub[..., 2] << 4)
    return flat, bit, inside


def query_packed_occupancy(
    packed_words: jnp.ndarray,
    positions: jnp.ndarray,
    config: OccGridConfig,
) -> jnp.ndarray:
    """Cell occupancy of world positions from the packed supercell words —
    bit-identical to query_occupancy(binaries, ...) (tested), one 8-byte
    gather from a ~1 MB table instead of a row from the 67 MB cell table."""
    flat, bit, inside = _packed_cell_index(positions, config)
    flat = jax.lax.optimization_barrier(flat)  # see query_grid_values
    rows = jnp.take(
        packed_words.reshape(-1, 2), flat.reshape(-1), axis=0, mode="clip"
    ).reshape(*flat.shape, 2)
    word = jnp.where(bit < 32, rows[..., 0], rows[..., 1])
    b = (bit & 31).astype(jnp.uint32)
    return (((word >> b) & jnp.uint32(1)) == 1) & inside


def query_packed_supercell(
    packed_words: jnp.ndarray,
    positions: jnp.ndarray,
    config: OccGridConfig,
) -> jnp.ndarray:
    """SUPERCELL occupancy (any of its 4^3 cells occupied) of world
    positions — the pooled pre-pass query, from the same packed table
    (equivalent to query_occupancy(binaries_pooled, ..., res=r/4))."""
    flat, _, inside = _packed_cell_index(positions, config)
    flat = jax.lax.optimization_barrier(flat)
    rows = jnp.take(
        packed_words.reshape(-1, 2), flat.reshape(-1), axis=0, mode="clip"
    ).reshape(*flat.shape, 2)
    return ((rows[..., 0] | rows[..., 1]) != 0) & inside


def _eval_occ(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    positions: jnp.ndarray,
    chunk: int = 1 << 20,
) -> jnp.ndarray:
    """Chunked density evaluation over (N, 3) positions -> (N,).

    Partial updates (<= one chunk of probes) evaluate in a single direct
    call — the lax.map+pad detour measured ~55 ms of pure overhead per
    update at 917k probes (docs/PERFORMANCE.md). The chunked path remains
    for full (warmup) updates, whose 8.4M probes would otherwise material-
    ise multi-GB (N, lanes) hash-encode intermediates.
    """
    n = positions.shape[0]
    if n <= chunk:
        pad = (-n) % 1024  # lane/tile alignment only
        if pad:
            positions = jnp.concatenate(
                [positions, jnp.zeros((pad, 3), positions.dtype)], axis=0
            )
        return density_fn(positions)[:n]
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
):
    """One EMA update of the grid. `full=True` updates every cell (warmup);
    otherwise a random subset per level (config.sample_fraction for level 0,
    config.outer_sample_fraction for the outer cascades; sampled with
    replacement, half uniform + half currently-occupied as in nerfacc)."""
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
        bin_lvl = state["binaries"].reshape(L, res3)
        cum = jnp.cumsum(bin_lvl.astype(jnp.int32), axis=1)  # (L, res3)
        count = cum[:, -1]  # (L,)
        cells, levels = [], []
        for lvl_i in range(L):
            frac = config.sample_fraction if lvl_i == 0 else (
                config.outer_sample_fraction or config.sample_fraction
            )
            m = max(int(res3 * frac), 2)
            m_occ = m // 2
            m_uni = m - m_occ
            k_cells, k_uni, k_fall, k_rank = jax.random.split(k_cells, 4)
            uni = jax.random.randint(k_uni, (m_uni,), 0, res3, dtype=jnp.int32)
            # STRATIFIED occupied ranks (sorted by construction): uniform
            # marginally over occupied cells like nerfacc's draw, lower
            # variance, and sorted queries let searchsorted use the
            # sort-merge method — one ~5 ms argsort instead of log2(res^3)
            # rounds of take_along_axis gathers (~45 ms at 262k queries,
            # the dominant cell-selection cost; docs/PERFORMANCE.md).
            u = jax.random.uniform(k_rank, (m_occ,))
            strat = (jnp.arange(m_occ, dtype=jnp.float32) + u) / m_occ
            rank = jnp.floor(strat * count[lvl_i].astype(jnp.float32)).astype(
                jnp.int32
            )
            occ_idx = jnp.searchsorted(
                cum[lvl_i], rank, side="right", method="sort"
            ).astype(jnp.int32)
            fallback = jax.random.randint(k_fall, (m_occ,), 0, res3, dtype=jnp.int32)
            occ_idx = jnp.where(
                count[lvl_i] > 0, jnp.minimum(occ_idx, res3 - 1), fallback
            )
            cells.append(jnp.concatenate([uni, occ_idx]))
            levels.append(jnp.full((m,), lvl_i, dtype=jnp.int32))
        cell_flat = jnp.concatenate(cells)
        level = jnp.concatenate(levels)

    jitter = jax.random.uniform(k_jit, (cell_flat.shape[0], 3))
    positions = _level_world_positions(config, level, cell_flat, jitter)
    occ = _eval_occ(density_fn, positions) * render_step_size

    flat_idx = level * res3 + cell_flat
    old = jnp.take(state["occs"], flat_idx, axis=0)
    # defense in depth: a single NaN here would persist forever through the
    # EMA max and silently empty the grid
    occ = jnp.nan_to_num(occ)
    new = jnp.maximum(old * config.ema_decay, occ)
    occs = state["occs"].at[flat_idx].set(new)

    # lower envelope: drop instantly to a lower probe, rise GEOMETRICALLY
    # (x2 per update, seeded at occ_thre) under persistently higher
    # probes — a per-cell lower bound on density*step for quality-safe
    # march termination (see init_occ_state). The rise must be
    # multiplicative: probe densities are heavy-tailed (a sharp surface
    # spike inside a mostly-empty cell reads 0.05 or 900 depending on the
    # jitter), and a linear pull like 0.75*low + 0.25*probe jumps a
    # boundary cell's "lower bound" to ~225 on a single high probe —
    # measured -13.6 dB of rendering loss from the resulting over-culling.
    old_low = jnp.take(
        state.get("occs_low", state["occs"]), flat_idx, axis=0
    )
    rise = jnp.maximum(old_low * 2.0, config.occ_thre)
    new_low = jnp.minimum(occ, rise)
    occs_low = state.get(
        "occs_low", jnp.zeros_like(state["occs"])
    ).at[flat_idx].set(new_low)

    thre = jnp.minimum(jnp.mean(occs), config.occ_thre)
    binaries = occs > thre
    out = {"occs": occs, "occs_low": occs_low, "binaries": binaries}
    # hot-query row table: [occupancy as 0/1, lower-envelope density] per
    # cell — the march gathers ONE 8-byte row instead of a width-1 byte
    # (1.8x cheaper per row), and gets the od-culling value for free
    out["occ_rows"] = jnp.stack(
        [binaries.astype(jnp.float32), occs_low], axis=-1
    ).reshape(-1)  # FLAT in state: 2-wide carries tile-pad (see init)
    if config.pool > 1:
        pooled = _pool_binaries(binaries, config)
        out["binaries_pooled"] = pooled
        pf = pooled.astype(jnp.float32)
        out["pooled_rows"] = jnp.stack([pf, pf], axis=-1).reshape(-1)
    if config.resolution % 4 == 0:
        out["packed_words"] = _pack_supercell_words(binaries, config)
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
    if "occs_low" in state:
        out["occs_low"] = state["occs_low"]
    if "occ_rows" in state:
        out["occ_rows"] = jnp.stack(
            [jnp.ones_like(state["occs"]), state["occs_low"]], axis=-1
        ).reshape(-1)
    if "binaries_pooled" in state:
        out["binaries_pooled"] = jnp.ones_like(state["binaries_pooled"])
    if "pooled_rows" in state:
        out["pooled_rows"] = jnp.ones_like(state["pooled_rows"])
    if "packed_words" in state:
        out["packed_words"] = jnp.full_like(
            state["packed_words"], jnp.uint32(0xFFFFFFFF)
        )
    return out
