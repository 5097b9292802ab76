"""On-TPU A/B probe: XLA row gather vs a Pallas DMA gather for the
hash-encode hot path.

The hash-encode forward's cost is one row gather per (sample, lane):
~16.3M rows of 8 B from a ~48 MB table per production batch
(docs/PERFORMANCE.md "hash encode fwd ... raw-gather floor"). This probe
measures whether a hand-written Pallas kernel can move random table rows
faster than XLA's gather, standing in for tcnn's fused HashGrid CUDA
kernel (/root/reference/umhsnerf/umhs_field.py:22).

Arms:
  xla       jnp.take row gather at the production shape (the deployed path,
            ops/encodings.py:_hash_encode_impl)
  pallas    per-row async-copy DMA gather: scalar-prefetched indices drive
            one HBM->VMEM copy per row, all copies of a block issued before
            any wait (hardware-queue overlapped)

Run:  python scripts/probe_pallas_gather.py            (TPU measurement)
      python scripts/probe_pallas_gather.py --check    (CPU interpret-mode
                                                        correctness only)
Writes one line per arm: rows, wall ms per call, ns/row.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 2  # features per table row (reference hash: 2 features/level)
BLOCK = 2048  # rows gathered per Pallas grid step


def _pallas_gather(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool):
    """Gather table[idx] (N, F) via per-row DMAs, BLOCK rows per grid step."""
    n = idx.shape[0]
    assert n % BLOCK == 0

    def kernel(idx_ref, table_ref, out_ref, scratch_ref, sem):
        b = pl.program_id(0)
        base = b * BLOCK

        def issue(i, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + i], 1), :],
                scratch_ref.at[pl.ds(i, 1), :],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, BLOCK, issue, 0)

        def drain(i, _):
            # same-shape copy descriptor -> waits for one row's byte count
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + i], 1), :],
                scratch_ref.at[pl.ds(i, 1), :],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, BLOCK, drain, 0)
        out_ref[:] = scratch_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLOCK, F), lambda b, idx_ref: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, F), table.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, F), table.dtype),
        interpret=interpret,
    )(idx, table)


def _time(fn, *args, iters: int = 3) -> float:
    """Median wall ms per call; run-then-fetch (the axon relay does not
    honour block_until_ready — fetching a scalar is the sync point)."""
    out = fn(*args)
    float(jnp.sum(out[0]))  # compile + sync
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out[0]))
        times.append(time.time() - t0)
    return float(np.median(times)) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU interpret-mode parity only")
    ap.add_argument("--rows", type=int, default=0, help="override gather row count")
    args = ap.parse_args()

    if args.check:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        table = jnp.asarray(np.random.default_rng(0).normal(size=(4096, F)), jnp.float32)
        idx = jnp.asarray(np.random.default_rng(1).integers(0, 4096, size=2 * BLOCK), jnp.int32)
        got = _pallas_gather(table, idx, interpret=True)
        want = jnp.take(table, idx, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        print("interpret-mode parity OK")
        return

    rng = np.random.default_rng(0)
    table_rows = 12_000_000  # ~= sum of L16xF2 2^19 level sizes (~48 MB f32)
    table = jnp.asarray(rng.normal(size=(table_rows, F)).astype(np.float32))

    # production shape: ~254.7k compact samples x 64 tetra lanes
    n_xla = args.rows or (254_976 * 64 // BLOCK * BLOCK)
    idx_np = rng.integers(0, table_rows, size=n_xla).astype(np.int32)
    idx = jnp.asarray(idx_np)

    xla_fn = jax.jit(lambda t, i: jnp.take(t, jax.lax.optimization_barrier(i), axis=0))
    ms = _time(xla_fn, table, idx)
    print(f"xla     rows={n_xla:>10,}  {ms:8.2f} ms  {ms * 1e6 / n_xla:6.2f} ns/row")

    # Pallas arm at a reduced row count (per-row DMA issue cost dominates;
    # extrapolation is linear in rows)
    n_pl = min(n_xla, 1_048_576)
    idx_pl = jnp.asarray(idx_np[:n_pl])
    pl_fn = jax.jit(lambda t, i: _pallas_gather(t, i, interpret=False))
    try:
        got = pl_fn(table, idx_pl)
        want = jnp.take(table, idx_pl, axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)
        ms = _time(pl_fn, table, idx_pl)
        print(f"pallas  rows={n_pl:>10,}  {ms:8.2f} ms  {ms * 1e6 / n_pl:6.2f} ns/row")
    except Exception as e:  # noqa: BLE001
        # Measured outcome on v5e (2026-08): Mosaic rejects the per-row DMA —
        # "Slice shape along dimension 1 must be aligned to tiling (128),
        # but is 2". An HBM memref of (T, 2) f32 rows is tiled (1, 128);
        # the minimum DMA-able row slice is 128 lanes (512 B), 64x the
        # 8-byte feature row. A structurally conforming kernel would either
        # pad rows 64x (3 GB table) or issue one scalar-core DMA per row
        # (~10^2 ns/DMA >> XLA's ~7.6 ns/row gather). Conclusion: XLA's
        # native gather IS the TPU hash-lookup primitive; the forward's
        # raw-gather floor stands (docs/PERFORMANCE.md round-3 section).
        msg = str(e).splitlines()[0][:160]
        print(f"pallas  STRUCTURALLY INFEASIBLE on this backend: {msg}")


if __name__ == "__main__":
    main()
