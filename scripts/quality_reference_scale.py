"""Reference-scale quality run: 30k steps, 512^2, 21 bands, full config.

Reproduces the reference's flagship training envelope
(/root/reference/umhsnerf/umhs_config.py:35-67 + scripts/hotdog.sh: 30k
iterations, Adam 2e-2 eps 1e-15 -> exp decay 1e-5, batch 4096 rays,
occupancy grid 128^3 x 4 levels, cone 0.004, hash L16xF2 2^19,
rgb+spectral method with specular residual, VCA init, temperature 0.4) on a
512^2 / 21-band NeSpoF-stand-in synthetic scene, then evaluates every eval
view (PSNR/SSIM/LPIPS + spectral PSNR/SSIM/SAM/RMSE — the metric set of
umhs_model.py:407-512) and writes docs/final_metrics.json.

Usage:  python scripts/quality_reference_scale.py [--steps N] [--out PATH]
        [--interp tetrahedral|trilinear]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--out", type=Path, default=REPO / "docs" / "final_metrics.json")
    ap.add_argument("--interp", default="tetrahedral",
                    choices=["tetrahedral", "trilinear"])
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--views", type=int, default=30)
    ap.add_argument("--seed", type=int, default=42,
                    help="trainer seed (init + sampling streams); the scene "
                         "itself is seed-independent, so varying this "
                         "measures run-to-run quality variance")
    ap.add_argument("--bands", type=int, default=21,
                    help="spectral bands: 21 = NeSpoF envelope "
                         "(/root/reference/data/spec2rgb.py:142), 141 = "
                         "Bayspec envelope (endmembers_hotdog.npy is 4x141)")
    ap.add_argument("--wl-start", type=float, default=None)
    ap.add_argument("--wl-step", type=float, default=None)
    ap.add_argument("--hs-dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="HS cube staging dtype (bfloat16 halves HBM for "
                         "141-band scenes, the production Bayspec setting)")
    ap.add_argument("--hash-levels", type=int, default=16)
    ap.add_argument("--hash-features", type=int, default=2)
    ap.add_argument("--log2-hashmap", type=int, default=19,
                    help="hash table shape; 16/2/19 is the reference's tcnn "
                         "config (umhs_field.py mlp_base), 8/4/19 the "
                         "TPU-optimized L8xF4 arm (same 64-wide encoding, "
                         "half the gather rows/sample)")
    ap.add_argument("--target-samples", type=int, default=24576,
                    help="dynamic-batch sample target. The default keeps the "
                         "ray batch at ~4096 (reference-envelope parity: "
                         "scripts/hotdog.sh trains at 4096 rays/batch, "
                         "anacampseros.sh at 2048/GPU) — which is why the "
                         "reference-parity quality rows report ~5-10k rays/s; "
                         "the per-step fixed costs dominate at R~2.5k. Raise "
                         "to ~200k-400k to let the batcher climb to the "
                         "bench-scale R (the TPU-native envelope).")
    args = ap.parse_args()
    # Bayspec envelope defaults: 400-1000 nm over 141 bands
    if args.wl_start is None:
        args.wl_start = 450.0 if args.bands == 21 else 400.0
    if args.wl_step is None:
        args.wl_step = 10.0 if args.bands == 21 else (600.0 / max(args.bands - 1, 1))
    if args.hs_dtype is None and args.bands > 64:
        args.hs_dtype = "bfloat16"

    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path.home() / ".cache" / "jax_comp"),
        )
    workdir = tempfile.mkdtemp(prefix="umhs_quality_")
    os.chdir(workdir)

    from umhs_tpu.data.datamanager import DataManagerConfig
    from umhs_tpu.data.dataparser import DataParserConfig
    from umhs_tpu.data.synthetic import SyntheticSceneConfig, write_dataset
    from umhs_tpu.engine.trainer import OptimizerConfig, Trainer, TrainerConfig
    from umhs_tpu.models.model import ModelConfig
    from umhs_tpu.utils import metrics as metrics_utils

    scene = SyntheticSceneConfig(
        num_views_train=args.views,
        num_views_eval=4,
        image_size=args.image_size,
        num_bands=args.bands,
        wavelength_start=args.wl_start,
        wavelength_step=args.wl_step,
        num_spheres=5,
    )
    root = write_dataset("scene", scene)

    t0 = time.time()
    trainer = Trainer(
        TrainerConfig(
            max_num_iterations=args.steps,
            steps_per_save=10**9,
            steps_per_eval_batch=5000,
            steps_per_eval_image=10**9,
            steps_per_log=1000,
            mixed_precision=True,
            use_mesh=True,
            experiment_name="quality-ref-scale",
            # reference training envelope: 4096 rays/batch (scripts/hotdog.sh).
            # The default --target-samples keeps R at ~4096 once the grid
            # converges (mean eval samples/ray ~6), adapting only the compact
            # budgets and S to the occupancy; larger values scale the batch
            # toward the bench-scale TPU envelope.
            target_num_samples=args.target_samples,
            seed=args.seed,
            optimizer=OptimizerConfig(
                lr=2e-2, eps=1e-15, lr_final=1e-5, max_steps=args.steps
            ),
        ),
        ModelConfig(
            method="rgb+spectral",
            pred_specular=True,
            load_vca=True,
            temperature=0.4,
            grid_resolution=128,
            grid_levels=4,
            cone_angle=0.004,
            hash_num_levels=args.hash_levels,
            hash_features_per_level=args.hash_features,
            log2_hashmap_size=args.log2_hashmap,
            num_candidates=1024,
            max_samples_per_ray=64,
            hash_interpolation=args.interp,
        ),
        DataManagerConfig(
            dataparser=DataParserConfig(data=root, num_classes=6),
            train_num_rays_per_batch=4096,
            eval_num_rays_per_batch=4096,
            **({"hs_dtype": args.hs_dtype} if args.hs_dtype else {}),
        ),
        num_classes=6,
    ).setup()
    setup_s = time.time() - t0
    print(f"# setup {setup_s:.1f}s", file=sys.stderr)

    t1 = time.time()
    last = trainer.train()
    train_s = time.time() - t1

    final = trainer.eval_all_images()
    total_rays = args.steps * 4096  # nominal; dynamic batching raises this
    result = {
        "config": {
            "steps": args.steps,
            "image_size": args.image_size,
            "bands": args.bands,
            "hs_dtype": args.hs_dtype or "float32",
            "num_classes": 6,
            "hash": (f"L{args.hash_levels}xF{args.hash_features} "
                     f"2^{args.log2_hashmap} ({args.interp})"),
            "grid": "128^3 x 4, cone 0.004",
            "batch_rays": 4096,
            "target_samples": args.target_samples,
            "lr": "2e-2 -> 1e-5 exp",
            "seed": args.seed,
        },
        "train_wall_clock_s": round(train_s, 1),
        "setup_s": round(setup_s, 1),
        "train_rays_per_sec": round(last.get("rays_per_sec", 0.0), 1),
        "lpips_variant": metrics_utils.LPIPS_VARIANT,
        "eval_all_images": {k: round(float(v), 5) for k, v in final.items()},
        "last_train_metrics": {
            k: round(float(v), 6) for k, v in last.items()
        },
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["eval_all_images"]))
    print(f"# wall clock {train_s/60:.1f} min; wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
