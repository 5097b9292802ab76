"""Probe: what does a new executable's first dispatch actually cost?

Round-4 cold runs showed each NEW chunk executable's first dispatch taking
~40-50 s (a 44.5 s slice vs 13.5 s steady at the same shape) — the
"program load" that dominates rung application cost now that compiles are
prefetched. This probe measures, on the real chip:

  1. first vs steady dispatch cost of a freshly compiled chunk executable;
  2. whether a SECOND executable handle compiled from the same lowering
     pays the load again (i.e., is the cost per-handle or per-program?);
  3. whether an async dummy execute on a THROWAWAY state copy, enqueued
     from the MAIN thread between real dispatches, hides the load (the
     round-4 attempt ran the dummy from the prefetch THREAD and raced the
     in-flight dispatch into INVALID_ARGUMENT; single-thread enqueue
     serializes device-side);
  4. fast-tier vs default-effort numerical parity on the scan-1 chunk
     (ADVICE round-4: document/verify the _ChunkExec hot-swap identity).

Usage: python scripts/probe_first_dispatch.py [--skip-parity]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def t():
    return time.time()


def fetch(x):
    """Force completion: host-fetch one scalar leaf (block_until_ready is
    a no-op through the axon relay — docs/PERFORMANCE.md header)."""
    import jax

    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(leaves[0].reshape(-1)[0])



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--rays", type=int, default=24064, help="rung-1-like shape")
    ap.add_argument("--scan", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # deliberately NO persistent compilation cache: we are measuring the
    # cold path (what the driver sees)
    os.chdir(tempfile.mkdtemp(prefix="umhs_probe_"))

    from umhs_tpu.data.datamanager import DataManagerConfig
    from umhs_tpu.data.dataparser import DataParserConfig
    from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
    from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
    from umhs_tpu.models.model import ModelConfig

    scene = SyntheticSceneConfig(
        num_views_train=4, num_views_eval=1, image_size=128, num_bands=128,
        wavelength_start=400.0, wavelength_step=2.0, num_spheres=6,
    )
    root = Path("scene")
    write_dataset(root, scene)

    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=10**6, mixed_precision=True, use_mesh=True,
            dynamic_batching=False, output_dir="outputs", experiment_name="probe",
            optimizer=OptimizerConfig(lr=2e-2, max_steps=10000),
        ),
        ModelConfig(
            method="rgb+spectral", pred_specular=True, load_vca=False,
            temperature=0.4, grid_resolution=128, grid_levels=4,
            num_candidates=1024, max_samples_per_ray=64, cone_angle=0.004,
            hash_num_levels=16, hash_features_per_level=2, log2_hashmap_size=19,
            stage_boundaries=(8, 16), march_pool=4,
        ),
        DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=6),
            train_num_rays_per_batch=args.rays,
            eval_num_rays_per_batch=1024,
        ),
        num_classes=6,
    ).setup()
    print(f"# setup done", flush=True)

    def fresh_state():
        return jax.tree.map(jnp.copy, trainer.state)

    def build(n, budget=None):
        return trainer._build_train_chunk(
            n, args.rays, trainer.model.march_config, budget, fuse_occ=False
        )

    # ---- 1. first vs steady dispatch -------------------------------------
    jitted = build(args.scan)
    t0 = t()
    lowered = jitted.lower(trainer.state, trainer.train_data, trainer.train_cam)
    t1 = t()
    fast = lowered.compile({"exec_time_optimization_effort": -1.0})
    t2 = t()
    print(f"# scan-{args.scan} lower {t1-t0:.1f}s fast-compile {t2-t1:.1f}s",
          flush=True)

    st = fresh_state()
    t0 = t()
    st, m = fast(st, trainer.train_data, trainer.train_cam)
    fetch(m)
    d1 = t() - t0
    times = []
    for _ in range(3):
        t0 = t()
        st, m = fast(st, trainer.train_data, trainer.train_cam)
        fetch(m)
        times.append(t() - t0)
    steady = min(times)
    print(f"# exec A: first dispatch {d1:.1f}s, steady {steady:.1f}s "
          f"(load overhead ~{d1-steady:.1f}s)", flush=True)

    # ---- 2. second handle from the same lowering --------------------------
    fast2 = lowered.compile({"exec_time_optimization_effort": -1.0})
    st2 = fresh_state()
    t0 = t()
    st2, m2 = fast2(st2, trainer.train_data, trainer.train_cam)
    fetch(m2)
    d2 = t() - t0
    print(f"# exec B (same lowering, new handle): first dispatch {d2:.1f}s",
          flush=True)

    # ---- 3. async overlap: does a queued dummy execute hide the load? ----
    # build a NEW shape (different rays) so its executable is genuinely
    # fresh, then: enqueue a steady-state dispatch of exec A (~steady s of
    # device work), then immediately enqueue the new exec on a throwaway
    # state — if the program load overlaps A's execution, the total is
    # ~max(load, steady) + step, not load + steady + step.
    rays_c = args.rays // 2
    jitted_c = trainer._build_train_chunk(
        args.scan, rays_c, trainer.model.march_config, None, fuse_occ=False
    )
    t0 = t()
    lowered_c = jitted_c.lower(trainer.state, trainer.train_data, trainer.train_cam)
    fast_c = lowered_c.compile({"exec_time_optimization_effort": -1.0})
    print(f"# exec C (rays={rays_c}) lower+compile {t()-t0:.1f}s", flush=True)

    stc = fresh_state()
    t0 = t()
    st, m = fast(st, trainer.train_data, trainer.train_cam)  # async enqueue
    ta = t() - t0
    stc, mc = fast_c(stc, trainer.train_data, trainer.train_cam)
    tb = t() - t0
    fetch(mc)
    fetch(m)
    total = t() - t0
    print(f"# overlap: enqueue A {ta:.2f}s, enqueue C {tb:.2f}s, "
          f"both done {total:.1f}s (serial would be ~{steady + d1:.1f}s)",
          flush=True)
    # steady-state of C afterwards, for reference
    t0 = t()
    stc, mc = fast_c(stc, trainer.train_data, trainer.train_cam)
    fetch(mc)
    print(f"# exec C second dispatch {t()-t0:.1f}s", flush=True)

    # ---- 4. tier parity on the scan-1 chunk -------------------------------
    if not args.skip_parity:
        jitted1 = build(1)
        t0 = t()
        low1 = jitted1.lower(trainer.state, trainer.train_data, trainer.train_cam)
        f1 = low1.compile({"exec_time_optimization_effort": -1.0})
        t1 = t()
        d1f = low1.compile()  # default effort
        t2 = t()
        print(f"# scan-1 fast {t1-t0:.1f}s default {t2-t1:.1f}s", flush=True)
        sa, sb = fresh_state(), fresh_state()
        sa, ma = f1(sa, trainer.train_data, trainer.train_cam)
        sb, mb = d1f(sb, trainer.train_data, trainer.train_cam)
        import numpy as np

        leaves_a = jax.tree.leaves(sa)
        leaves_b = jax.tree.leaves(sb)
        worst = 0.0
        exact = True
        for la, lb in zip(leaves_a, leaves_b):
            a, b = np.asarray(la), np.asarray(lb)
            if a.dtype.kind in "fc":
                if not np.array_equal(a, b, equal_nan=True):
                    exact = False
                    denom = np.maximum(np.abs(a), 1e-30)
                    worst = max(worst, float(np.max(np.abs(a - b) / denom)))
            else:
                if not np.array_equal(a, b):
                    exact = False
                    worst = float("inf")
        print(f"# tier parity (scan-1, one step): bitwise_equal={exact} "
              f"worst_rel_diff={worst:.3e}", flush=True)


if __name__ == "__main__":
    main()
