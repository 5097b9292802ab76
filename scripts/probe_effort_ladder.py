"""Probe: runtime vs compile-time across exec_time_optimization_effort.

Round 4 established the compile cliff (scan-16 chunk, initial bench shape):
default ~405-410 s, effort -0.4 ~405 s, -0.7 ~58 s, -1.0 ~46-55 s — and
that the effort -1.0 executable RUNS 1.53x slower than default (0.388 vs
0.253 s/step). Unknown: where the RUNTIME recovers along the ladder. If
-0.7 (or -0.85) compiles in ~1 min but runs near default speed, the fast
tier should sit there instead of -1.0 — every cold-window slice gets up to
1.5x faster, which directly scales the driver's scored cold number.

Measures, for each effort in the ladder, on the real chip, same lowering:
backend-compile seconds and steady-state s/step (min of 3x16-step
dispatches). Run with a quiet host (no concurrent pytest) — lowering is
GIL-bound on this single-CPU machine.

Usage: python scripts/probe_effort_ladder.py [--rays 4096] [--scan 16]
       [--efforts -1.0,-0.85,-0.7,-0.55]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--efforts", default="-1.0,-0.85,-0.7,-0.55")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    efforts = [float(x) for x in args.efforts.split(",") if x]

    import jax

    # no persistent cache: we are measuring compile cost
    os.chdir(tempfile.mkdtemp(prefix="umhs_effort_"))

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
    print("# setup done", flush=True)

    jitted = trainer._build_train_chunk(
        args.scan, args.rays, trainer.model.march_config, None, fuse_occ=False
    )
    t0 = time.time()
    lowered = jitted.lower(trainer.state, trainer.train_data, trainer.train_cam)
    print(f"# lower {time.time()-t0:.1f}s", flush=True)

    import jax.numpy as jnp

    def fetch(x):
        # relay-safe: block_until_ready is a no-op through axon
        leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
        return float(leaves[0].reshape(-1)[0])

    rows = []
    for e in efforts:
        t0 = time.time()
        ex = lowered.compile({"exec_time_optimization_effort": e})
        tc = time.time() - t0
        st = jax.tree.map(jnp.copy, trainer.state)
        # one unmeasured dispatch (device warm), then reps measured
        st, m = ex(st, trainer.train_data, trainer.train_cam)
        fetch(m)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            st, m = ex(st, trainer.train_data, trainer.train_cam)
            fetch(m)
            times.append(time.time() - t0)
        spstep = min(times) / args.scan
        rows.append((e, tc, spstep))
        print(
            f"# effort {e:+.2f}: compile {tc:.1f}s, steady "
            f"{spstep*1000:.1f} ms/step ({args.rays/spstep:,.0f} rays/s)",
            flush=True,
        )

    print("# effort, compile_s, ms_per_step")
    for e, tc, sp in rows:
        print(f"{e:+.2f}, {tc:.1f}, {sp*1000:.1f}")


if __name__ == "__main__":
    main()
