"""Position / direction encodings: frequency (NeRF), spherical harmonics, hash grid.

TPU-native equivalents of the encodings the reference pulls from
nerfstudio/tiny-cuda-nn (/root/reference/umhsnerf/umhs_field.py:18,22 and the
parent NerfactoField's `mlp_base` hash encoding):

- `nerf_encoding`: sin/cos frequency features (NeRFEncoding with
  num_frequencies=2, min/max freq exponents 0..1 in the reference field).
- `sh_encoding`: real spherical harmonics up to degree 4 (16 components),
  closed form — XLA fuses this into the surrounding MLP, no kernel needed.
- `HashEncoding`: multi-resolution hash grid (Instant-NGP). Dense indexing at
  coarse levels whose grid fits in the table, XOR-prime hashing at fine
  levels, trilinear interpolation. This is the TPU replacement for the
  tiny-cuda-nn fused HashGrid; it is a batched gather from one flat table so
  XLA can software-pipeline HBM loads.

All functions are shape-polymorphic over leading batch dims but keep the
last dim static (3 for positions/directions).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int = 2,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 1.0,
    include_input: bool = False,
) -> jnp.ndarray:
    """Sinusoidal frequency encoding: sin/cos(2^f * 2*pi * x).

    Output dim = in_dim * num_frequencies * 2 (+ in_dim if include_input).
    """
    freqs = 2.0 ** np.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    freqs = jnp.asarray(freqs, dtype=x.dtype)
    scaled = (2.0 * jnp.pi * x)[..., None] * freqs  # (..., D, F)
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    enc = jnp.concatenate([sin, cos], axis=-1)  # (..., D, 2F)
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * num_frequencies * 2)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def sh_encoding(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit directions, degrees 0..levels-1.

    levels=4 -> 16 components (matches SHEncoding(levels=4) in the reference
    field's direction encoding). Expects unit-norm directions in [-1, 1]^3.
    """
    assert 1 <= levels <= 4
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]
    if levels >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if levels >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if levels >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)


_HASH_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    """Static configuration of the multi-resolution hash grid."""

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048
    # Backward-pass variant: instead of splatting each sample's gradient to
    # all 8 trilinear corners, pick ONE corner per (sample, level) with
    # probability equal to its interpolation weight (unbiased) — 8x fewer
    # scatter-adds, the dominant training cost on TPU (XLA scatter ~9ns/elem).
    stochastic_grad: bool = False
    # Interpolation scheme. "trilinear" = 8 cube corners (tcnn parity).
    # "tetrahedral" = 4 simplex vertices (sort the fractional coords; the
    # industry-standard 3D-LUT tetrahedral interpolation, also used by
    # permutohedral-lattice encodings): C0-continuous, exact at corners,
    # and HALF the gather rows per sample — on TPU the hash-table row
    # gather is the dominant train cost (~45% of the step), so this is the
    # single biggest lever toward the reference L16xF2 shape being fast.
    interpolation: str = "trilinear"
    # Forward-gather strategy: split the coarse DENSE levels into table
    # slices small enough for the XLA:TPU small-table gather fast path
    # (~30% cheaper per row below ~1.6 MB — docs/PERFORMANCE.md cost
    # model) and gather them separately from the hashed levels' big table.
    # Bit-identical outputs; forward-only (the backward scatters into the
    # flat table either way).
    split_dense_gather: bool = False

    @property
    def verts_per_cell(self) -> int:
        return 4 if self.interpolation == "tetrahedral" else 8

    @property
    def gather_groups(self):
        """Static (lvl_start, lvl_end) groups for split_dense_gather: dense
        levels greedily packed into <=1.5 MB-of-f32 slices, then all
        remaining levels (incl. every hashed one) as the final big group."""
        max_rows = (1_500_000 // 4) // self.features_per_level
        sizes = self.level_sizes
        dense_levels = sum(
            1 for r in self.resolutions if r**3 <= self.hashmap_size
        )
        groups = []
        start, acc = 0, 0
        for lvl in range(dense_levels):
            if acc and acc + sizes[lvl] > max_rows:
                groups.append((start, lvl))
                start, acc = lvl, 0
            acc += sizes[lvl]
        if start < dense_levels:
            groups.append((start, dense_levels))
        if dense_levels < self.num_levels:
            groups.append((dense_levels, self.num_levels))
        return tuple(groups)

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.num_levels - 1)
        )

    @property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def scales(self) -> Sequence[float]:
        """Per-level grid scale: pos in [0,1] is multiplied by this."""
        return tuple(
            self.base_resolution * self.growth_factor**lvl - 1.0
            for lvl in range(self.num_levels)
        )

    @property
    def resolutions(self) -> Sequence[int]:
        return tuple(int(math.ceil(s)) + 1 for s in self.scales)

    @property
    def level_sizes(self) -> Sequence[int]:
        """Table entries per level: dense grid when it fits, else hashmap."""
        sizes = []
        for res in self.resolutions:
            dense = res**3
            sizes.append(dense if dense <= self.hashmap_size else self.hashmap_size)
        return tuple(sizes)

    @property
    def level_offsets(self) -> Sequence[int]:
        offs, acc = [], 0
        for s in self.level_sizes:
            offs.append(acc)
            acc += s
        return tuple(offs)

    @property
    def table_size(self) -> int:
        return sum(self.level_sizes)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level


def init_hash_table(
    key: jax.Array, config: HashEncodingConfig, dtype=jnp.float32
) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init, as in Instant-NGP.

    The table is stored FLAT (table_size * features_per_level,), feature-
    interleaved. A (T, F) parameter with tiny minor dim would be tile-padded
    64x by XLA whenever it is copied into a loop-carry layout (observed:
    three 2.91 GB copies — the param + both Adam moments — OOMing the chip);
    1-D arrays never pad.
    """
    return jax.random.uniform(
        key,
        (config.table_size * config.features_per_level,),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_indices(config: HashEncodingConfig):
    """Static per-level constants as numpy arrays for tracing."""
    scales = np.asarray(config.scales, dtype=np.float32)  # (L,)
    resolutions = np.asarray(config.resolutions, dtype=np.int32)
    sizes = np.asarray(config.level_sizes, dtype=np.int32)
    offsets = np.asarray(config.level_offsets, dtype=np.int32)
    dense = np.asarray(
        [r**3 <= config.hashmap_size for r in config.resolutions], dtype=bool
    )
    return scales, resolutions, sizes, offsets, dense


def hash_encode_reference(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Readable reference implementation (small (..., L, 8, 3) intermediates —
    fine on CPU, pathological layouts on TPU). Used as the golden value in
    unit tests; production path is `hash_encode` below."""
    table = table.reshape(config.table_size, config.features_per_level)
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)  # (N, 3)
    n = pos.shape[0]
    L = config.num_levels

    scales, resolutions, sizes, offsets, dense = _level_indices(config)
    scales_j = jnp.asarray(scales)  # (L,)
    res_j = jnp.asarray(resolutions)  # (L,)
    sizes_j = jnp.asarray(sizes)
    offsets_j = jnp.asarray(offsets)
    dense_j = jnp.asarray(dense)

    # Scale per level: x*scale + 0.5 (tcnn convention), corners via floor.
    scaled = pos[:, None, :] * scales_j[None, :, None] + 0.5  # (N, L, 3)
    base = jnp.floor(scaled)
    frac = scaled - base  # (N, L, 3)
    base = base.astype(jnp.int32)

    # 8 corner offsets (c & 1, c>>1 & 1, c>>2 & 1).
    corners = np.stack(
        [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], axis=0
    )  # (8, 3)
    corners_j = jnp.asarray(corners, dtype=jnp.int32)

    coords = base[:, :, None, :] + corners_j[None, None, :, :]  # (N, L, 8, 3)
    coords = jnp.clip(coords, 0, res_j[None, :, None, None] - 1)

    cx = coords[..., 0].astype(jnp.uint32)
    cy = coords[..., 1].astype(jnp.uint32)
    cz = coords[..., 2].astype(jnp.uint32)

    res_u = res_j.astype(jnp.uint32)[None, :, None]
    dense_idx = cx + cy * res_u + cz * res_u * res_u
    hashed_idx = (
        cx * np.uint32(_HASH_PRIMES[0])
        ^ cy * np.uint32(_HASH_PRIMES[1])
        ^ cz * np.uint32(_HASH_PRIMES[2])
    )
    sizes_u = sizes_j.astype(jnp.uint32)[None, :, None]
    idx = jnp.where(dense_j[None, :, None], dense_idx % sizes_u, hashed_idx % sizes_u)
    idx = idx.astype(jnp.int32) + offsets_j[None, :, None]  # (N, L, 8)

    feats = jnp.take(table, idx.reshape(-1), axis=0)  # (N*L*8, F)
    feats = feats.reshape(n, L, 8, config.features_per_level)

    # Trilinear weights per corner.
    w = jnp.where(corners_j[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]  # (N, L, 8)

    out = jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=2)  # (N, L, F)
    return out.reshape(*batch_shape, config.output_dim)


def _lane_constants(config: HashEncodingConfig):
    """Per-lane (level, corner) static constants, lane = level*8 + corner.

    TPU tiles the two minor dims as (8, 128); any tensor whose minor dim is
    3 or 8 pads to 128 lanes (up to 42x memory blowup — observed as a 25 GB
    allocation for a (1M, 16, 8, 3) corner-coordinate intermediate). Folding
    (level, corner) into one lane axis of exactly num_levels*8 (= 128 for the
    reference's 16 levels) makes every intermediate perfectly tile-aligned.
    """
    L = config.num_levels
    lanes = L * 8
    lane = np.arange(lanes)
    lvl = lane // 8
    corner = lane % 8
    scales, resolutions, sizes, offsets, dense = _level_indices(config)
    return {
        "lanes": lanes,
        "scale": scales[lvl][None, :],  # (1, lanes) f32
        "res": resolutions[lvl][None, :].astype(np.int32),
        "size": sizes[lvl][None, :].astype(np.uint32),
        "offset": offsets[lvl][None, :].astype(np.int32),
        "dense": dense[lvl][None, :],
        "ox": ((corner >> 0) & 1)[None, :].astype(np.int32),
        "oy": ((corner >> 1) & 1)[None, :].astype(np.int32),
        "oz": ((corner >> 2) & 1)[None, :].astype(np.int32),
        # corner-sum matrix: (lanes, L) with 1 where lane's level == column
        "reduce": (lvl[:, None] == np.arange(L)[None, :]).astype(np.float32),
    }


def _lane_axis(p, o_key, lane):
    """Per-axis scaled coordinate, integer corner coord, interp weight —
    all (N, lanes)."""
    s = p * lane["scale"] + 0.5  # (N, lanes)
    base = jnp.floor(s)
    frac = s - base
    o = jnp.asarray(lane[o_key])
    coord = jnp.clip(base.astype(jnp.int32) + o, 0, jnp.asarray(lane["res"]) - 1)
    weight = jnp.where(o == 1, frac, 1.0 - frac)
    return coord, weight


def _hash_lane_index(cx, cy, cz, lane):
    """Table row index per lane from integer corner coords (N, lanes):
    dense levels use the linear index, hashed levels the XOR-prime hash.

    No integer modulo anywhere (the VPU has no hardware int div; a general
    `% size` on (N, 128) lanes is a multi-op expansion): dense linear
    indices are < size by construction (coords are clipped to res-1), and
    hashed level sizes are always the power-of-two hashmap_size, so the mod
    is a bitwise AND."""
    res_u = jnp.asarray(lane["res"]).astype(jnp.uint32)
    cxu, cyu, czu = cx.astype(jnp.uint32), cy.astype(jnp.uint32), cz.astype(jnp.uint32)
    dense_idx = cxu + cyu * res_u + czu * res_u * res_u
    hashed_idx = (
        cxu * np.uint32(_HASH_PRIMES[0])
        ^ cyu * np.uint32(_HASH_PRIMES[1])
        ^ czu * np.uint32(_HASH_PRIMES[2])
    ) & jnp.asarray(lane["size"] - 1)
    idx = jnp.where(jnp.asarray(lane["dense"]), dense_idx, hashed_idx)
    return idx.astype(jnp.int32) + jnp.asarray(lane["offset"])


def _lane_constants_tetra(config: HashEncodingConfig):
    """Static per-lane constants for the 4-vertex layout, lane = level*4+v."""
    L = config.num_levels
    lanes = L * 4
    lane = np.arange(lanes)
    lvl = lane // 4
    scales, resolutions, sizes, offsets, dense = _level_indices(config)
    return {
        "lanes": lanes,
        "vert": (lane % 4)[None, :].astype(np.int32),  # (1, lanes)
        "scale_l": scales[None, :],  # (1, L)
        "res": resolutions[lvl][None, :].astype(np.int32),
        "res_l": resolutions[None, :].astype(np.int32),  # (1, L)
        "size": sizes[lvl][None, :].astype(np.uint32),
        "offset": offsets[lvl][None, :].astype(np.int32),
        "dense": dense[lvl][None, :],
        "reduce": (lvl[:, None] == np.arange(L)[None, :]).astype(np.float32),
    }


def _lane_iw_tetra(pos: jnp.ndarray, config: HashEncodingConfig):
    """Simplex-vertex table indices + barycentric weights, (N, L*4) layout.

    Tetrahedral interpolation: sort the fractional coords f_(1)>=f_(2)>=f_(3);
    vertex v adds the v largest axes to the base corner; weights are
    (1-f_(1), f_(1)-f_(2), f_(2)-f_(3), f_(3)). Exact at corners, C0 across
    cell boundaries, half the gathers of trilinear.
    """
    lane = _lane_constants_tetra(config)
    L = config.num_levels

    def per_axis(p):
        s = p * jnp.asarray(lane["scale_l"]) + 0.5  # (N, L)
        base = jnp.floor(s)
        return base.astype(jnp.int32), s - base

    bx, fx = per_axis(pos[:, 0:1])
    by, fy = per_axis(pos[:, 1:2])
    bz, fz = per_axis(pos[:, 2:3])

    # distinct ranks 0..2 (0 = largest frac), ties broken by axis order
    rx = (fx < fy).astype(jnp.int32) + (fx < fz).astype(jnp.int32)
    ry = (fy <= fx).astype(jnp.int32) + (fy < fz).astype(jnp.int32)
    rz = (fz <= fx).astype(jnp.int32) + (fz <= fy).astype(jnp.int32)

    rep = lambda a: jnp.repeat(a, 4, axis=1)  # (N, L) -> (N, L*4)
    v = jnp.asarray(lane["vert"])  # (1, lanes)
    res_m1 = jnp.asarray(lane["res"]) - 1
    cx = jnp.clip(rep(bx) + (rep(rx) < v).astype(jnp.int32), 0, res_m1)
    cy = jnp.clip(rep(by) + (rep(ry) < v).astype(jnp.int32), 0, res_m1)
    cz = jnp.clip(rep(bz) + (rep(rz) < v).astype(jnp.int32), 0, res_m1)
    idx = _hash_lane_index(cx, cy, cz, lane)  # (N, lanes)

    fmax = jnp.maximum(fx, jnp.maximum(fy, fz))
    fmin = jnp.minimum(fx, jnp.minimum(fy, fz))
    fmid = fx + fy + fz - fmax - fmin
    w = jnp.stack(
        [1.0 - fmax, fmax - fmid, fmid - fmin, fmin], axis=-1
    )  # (N, L, 4)
    weights = w.reshape(w.shape[0], L * 4)
    return idx, weights, lane


def _lane_indices_weights(pos: jnp.ndarray, config: HashEncodingConfig):
    """Vertex table indices + interpolation weights in the (N, lanes) layout;
    lanes = num_levels * verts_per_cell (trilinear 8 / tetrahedral 4)."""
    if config.interpolation == "tetrahedral":
        return _lane_iw_tetra(pos, config)
    lane = _lane_constants(config)
    px, py, pz = pos[:, 0:1], pos[:, 1:2], pos[:, 2:3]  # (N, 1)
    cx, wx = _lane_axis(px, "ox", lane)
    cy, wy = _lane_axis(py, "oy", lane)
    cz, wz = _lane_axis(pz, "oz", lane)

    idx = _hash_lane_index(cx, cy, cz, lane)  # (N, lanes)
    weights = wx * wy * wz  # (N, lanes) f32
    return idx, weights, lane


def _hash_encode_impl(table, pos, config: HashEncodingConfig):
    n = pos.shape[0]
    F = config.features_per_level
    idx, weights, lane = _lane_indices_weights(pos, config)
    # Fusion break: letting XLA fuse the index computation into the gather's
    # operand slows the gather itself ~1.5x (measured on v5e: 209 -> 142 ms
    # at 21.6M rows). Materialise indices first; the gather then runs at the
    # raw-gather rate.
    idx = jax.lax.optimization_barrier(idx)
    weights = weights.astype(table.dtype)
    reduce_mat = jnp.asarray(lane["reduce"], dtype=jnp.float32)  # (lanes, L)

    # ONE row gather for all features: measured 2.6x faster than F separate
    # flat gathers or 1-D slice gathers on TPU v5e (XLA row-gather cost is
    # ~per row, not per element, up to ~8 f32 of width). The PARAMETER is
    # flat 1-D (a (T, F) carry would be tile-padded 64x in loop layouts);
    # the 2-D view here is a free in-graph reshape that XLA fuses into the
    # gather without materialising a padded copy (measured).
    table2d = table.reshape(-1, F)
    if config.split_dense_gather:
        # per-group gathers: the dense coarse levels' slices are <=1.5 MB
        # and hit the small-table fast path; indices are rebased into each
        # slice (lane order is level-major, so groups are contiguous lanes)
        V = config.verts_per_cell
        offsets = config.level_offsets
        sizes = config.level_sizes
        feats_parts = []
        for lvl_s, lvl_e in config.gather_groups:
            o0 = offsets[lvl_s]
            o1 = offsets[lvl_e - 1] + sizes[lvl_e - 1]
            idx_g = idx[:, lvl_s * V : lvl_e * V] - o0
            feats_parts.append(
                jnp.take(table2d[o0:o1], idx_g.reshape(-1), axis=0).reshape(
                    n, (lvl_e - lvl_s) * V, F
                )
            )
        rows = jnp.concatenate(feats_parts, axis=1).reshape(-1, F)
    else:
        rows = jnp.take(table2d, idx.reshape(-1), axis=0)  # (N*lanes, F)
    outs = []
    for f in range(F):
        feats = rows[:, f].reshape(n, -1)
        weighted = (feats * weights).astype(jnp.float32)
        outs.append(
            jnp.dot(weighted, reduce_mat, preferred_element_type=jnp.float32)
        )  # (N, L)
    out = jnp.stack(outs, axis=-1)  # (N, L, F)
    return out.reshape(n, config.output_dim).astype(table.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_encode_vjp(table, pos, config: HashEncodingConfig):
    return _hash_encode_impl(table, pos, config)


def _hash_encode_fwd(table, pos, config):
    # Residuals: positions only; indices/weights are cheap VPU math to
    # recompute and would otherwise hold 2x (N, 128) arrays alive. The table
    # shape/dtype are static (derivable from config; tables are float32).
    return _hash_encode_impl(table, pos, config), pos


def _hash_encode_bwd(config, res, g):
    """Backward: dL/dtable = scatter-add of (corner weight x upstream grad).

    Measured on TPU v5e: XLA scatter-add runs ~5x faster for width-1 rows
    (one flat element per index) than for multi-feature rows, so the F
    feature columns are scattered as F independent flat width-1 scatter-adds
    into the feature-interleaved flat table.
    """
    pos = res
    n = pos.shape[0]
    L, F = config.num_levels, config.features_per_level
    idx, weights, lane = _lane_indices_weights(pos, config)

    g = g.reshape(n, L, F).astype(jnp.float32)
    flat_size = config.table_size * F
    grad_flat = jnp.zeros((flat_size,), dtype=jnp.float32)

    V = config.verts_per_cell
    if config.stochastic_grad:
        # One vertex per (sample, level), chosen with probability equal to
        # its interpolation weight (weights within a level sum to 1) — an
        # unbiased estimator with V-times fewer scatter elements. The uniform
        # variate is a shader-style position hash: stratified ray jitter
        # re-randomises it every step.
        assert config.table_size < (1 << 24), (
            "stochastic_grad selects indices through f32 matmuls; table too large"
        )
        lanes = L * V
        u = jnp.mod(
            jnp.sin(pos @ jnp.array([12.9898, 78.233, 37.719])) * 43758.5453,
            1.0,
        )  # (N,)
        u = jnp.mod(
            u[:, None] + jnp.arange(L, dtype=jnp.float32)[None, :] * 0.6180339887,
            1.0,
        )  # (N, L)
        u_lane = jnp.repeat(u, V, axis=1)  # (N, lanes)

        # inclusive cumsum of vertex weights within each level's V lanes,
        # as an MXU matmul with a block lower-triangular 0/1 matrix
        li = np.arange(lanes)
        tri = ((li[:, None] // V == li[None, :] // V) & (li[:, None] <= li[None, :])).astype(
            np.float32
        )
        cumw = jnp.dot(
            weights,
            jnp.asarray(tri),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sel = (u_lane < cumw) & (u_lane >= cumw - weights)
        # fp guard: if rounding made the level total < u, take the last lane
        is_last = jnp.asarray((li % V == V - 1)[None, :])
        sel = sel | (is_last & (u_lane >= cumw))
        sel_f = sel.astype(jnp.float32)

        group = jnp.asarray(lane["reduce"], dtype=jnp.float32)  # (lanes, L)
        # Precision.HIGHEST is required: TPU's default matmul precision is
        # bf16 (8-bit mantissa), which rounds integer-valued indices above
        # ~1024 and scatters gradients into wrong rows. HIGHEST uses the
        # exact bf16x-decomposition — one-hot x f32-exact ints stays exact.
        idx_sel = jnp.dot(
            idx.astype(jnp.float32) * sel_f,
            group,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)  # (N, L) — exact: indices < 2^24
        # fusion break before the scatter for the same reason as the
        # forward gather: fused index math slows the scatter op itself
        flat_idx = jax.lax.optimization_barrier(idx_sel * F)
        for f in range(F):
            grad_flat = grad_flat.at[(flat_idx + f).reshape(-1)].add(
                g[:, :, f].reshape(-1)
            )
    else:
        flat_idx = jax.lax.optimization_barrier(idx * F)  # (N, lanes)
        for f in range(F):
            # broadcast level grads to vertex lanes, apply interp weights
            g_lane = jnp.repeat(g[:, :, f], V, axis=1) * weights  # (N, lanes)
            grad_flat = grad_flat.at[(flat_idx + f).reshape(-1)].add(
                g_lane.reshape(-1)
            )
    return grad_flat, None


_hash_encode_vjp.defvjp(_hash_encode_fwd, _hash_encode_bwd)


def hash_encode(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Multi-resolution hash encoding of positions in [0, 1]^3 — TPU layout.

    All intermediates are (N, num_levels*8) — lane-dim exactly 128 for the
    reference config — gathers hit a flat 1-D table (no lane padding), the
    8-corner reduction is an MXU matmul against a 0/1 level-selection matrix,
    and the backward pass is a custom VJP using flat width-1 scatter-adds
    (the fastest XLA:TPU scatter form by a 5x margin).

    Args:
        table: (table_size, features_per_level) parameter array.
        positions: (..., 3) in [0, 1].

    Returns:
        (..., num_levels * features_per_level) interpolated features.
    """
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3).astype(jnp.float32)
    out = _hash_encode_vjp(table, pos, config)
    return out.reshape(*batch_shape, config.output_dim)
