"""Benchmark: training-step ray throughput on the flagship spectral config.

Measures steady-state rays/sec of the full fused train step (pixel sampling
-> ray generation -> occupancy marching -> hash-grid field -> spectral
unmixing heads -> compositing over all bands -> losses -> grads -> adam)
on a synthetic 128-band hotdog-stand-in scene with reference-like
hyperparameters (scripts/hotdog.sh: 4096 rays/batch, 6 classes, specular on,
temperature 0.4; 128 bands per BASELINE.md's "rays/sec/chip on 128-band
hotdog" metric).

Baseline: the reference publishes no numbers (BASELINE.md). We anchor
vs_baseline to an estimated 150k rays/s for the reference stack
(nerfacc+tcnn fp16 instant-NGP with a 128-band spectral head) on one A100 —
the BASELINE.json target is >=5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path
import tempfile
import time

import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 150_000.0


def main():
    t_setup = time.time()
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir", str(Path.home() / ".cache" / "jax_comp")
        )
    os.chdir(tempfile.mkdtemp(prefix="umhs_bench_"))

    from umhs_tpu.data.datamanager import DataManagerConfig
    from umhs_tpu.data.dataparser import DataParserConfig
    from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
    from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
    from umhs_tpu.models.model import ModelConfig

    scene = SyntheticSceneConfig(
        num_views_train=16,
        num_views_eval=2,
        image_size=128,
        num_bands=128,
        wavelength_start=400.0,
        wavelength_step=2.0,
        num_spheres=6,
    )
    root = write_dataset("scene", scene)

    batch = 4096
    # warmup past the occupancy-grid warmup (256), the march od-culling
    # gate (512) and the dynamic-batch adaptation boundaries so the
    # measured window reflects converged steady state
    steps_warmup, steps_measure = 560, 160
    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=steps_warmup + steps_measure,
            steps_per_save=10**9,
            steps_per_eval_batch=10**9,
            steps_per_log=10**9,
            output_dir="outputs",
            experiment_name="bench",
            mixed_precision=True,
            use_mesh=True,
            dynamic_batching=True,
            adapt_steps=(272, 544),
            optimizer=OptimizerConfig(lr=1e-2, max_steps=10000),
        ),
        ModelConfig(
            method="rgb+spectral",
            pred_specular=True,
            load_vca=True,
            temperature=0.4,
            # FULL reference occupancy + hash configuration
            # (/root/reference/umhsnerf/umhs_model.py:74-85): 128^3 x 4-level
            # grid, cone_angle 0.004, hash 16 levels x 2 features, 2^19 table.
            grid_resolution=128,
            grid_levels=4,
            num_candidates=1024,
            max_samples_per_ray=64,
            cone_angle=0.004,
            hash_num_levels=16,
            hash_features_per_level=2,
            log2_hashmap_size=19,
            # TPU-native execution choices (same model class, not a softer
            # config): tetrahedral 4-vertex interpolation (half the gather
            # rows; quality A/B in docs/PERFORMANCE.md) and the hierarchical
            # pooled-grid march pre-pass.
            hash_interpolation="tetrahedral",
            march_pool=4,
        ),
        DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=6),
            train_num_rays_per_batch=batch,
            eval_num_rays_per_batch=1024,
        ),
        num_classes=6,
    ).setup()
    print(f"# setup {time.time() - t_setup:.1f}s", file=sys.stderr)

    # warmup (compiles + grid convergence)
    t0 = time.time()
    trainer.train(num_iterations=steps_warmup)
    print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr)

    # measured window (rays/batch may have been adapted upward — the
    # trainer's own window accounting counts actual rays)
    metrics = trainer.train(num_iterations=steps_warmup + steps_measure)
    rays_per_sec = metrics["rays_per_sec"]
    dt = metrics.get("total_train_time_s", 0.0)

    ev = trainer.eval_batch()
    print(
        f"# measured {steps_measure} steps in {dt:.2f}s; "
        f"psnr={ev.get('psnr', 0):.2f} psnr_spectral={ev.get('psnr_spectral', 0):.2f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_128band",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
