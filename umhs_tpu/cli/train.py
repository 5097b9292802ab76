"""`umhs-train` — the ns-train equivalent.

Reference surface: `ns-train umhsnerf --data PATH [--pipeline.model.* ...]`
(/root/reference/README.md:11, scripts/*.sh). Same dotted flags, resolved
config written to <output>/<experiment>/<method>/config.yml for the eval /
render CLIs to reload.

Usage:
    python -m umhs_tpu.cli.train umhsnerf --data data/processed/hotdog \
        --pipeline.model.method rgb+spectral --pipeline.num_classes 6 \
        --pipeline.model.temperature 0.4 --pipeline.model.pred_specular True \
        --pipeline.model.load_vca True \
        --pipeline.datamanager.train-num-rays-per-batch 4096 \
        --experiment-name hotdog-t0.4-k6 --vis console
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from ..configs import (
        apply_cli_overrides,
        save_config,
        umhs_method_defaults,
    )
    from ..engine.trainer import Trainer

    method = "umhsnerf"
    if argv and not argv[0].startswith("--"):
        method = argv.pop(0)

    config = umhs_method_defaults()
    config, ignored = apply_cli_overrides(config, argv)
    if ignored:
        print(f"[umhs-train] accepted-but-inert flags: {ignored}")
    if config.pipeline.check_nan:
        # reference: check_nan -> torch.autograd.set_detect_anomaly
        # (umhs_pipeline.py:77-78); JAX equivalent re-runs ops on NaN
        from ..utils.hooks import enable_nan_checks

        enable_nan_checks(True)

    trainer = Trainer(
        config.trainer,
        config.pipeline.model,
        config.pipeline.datamanager,
        num_classes=config.pipeline.num_classes,
    )
    save_config(config, trainer.run_dir / "config.yml")
    print(f"[umhs-train] method={method} run_dir={trainer.run_dir}")
    print(f"[umhs-train] devices={len(__import__('jax').devices())}")

    trainer.setup()
    final_metrics = trainer.train()
    print(f"[umhs-train] done: {json.dumps(final_metrics)}")

    # final eval summary over eval images
    evals = trainer.eval_all_images()
    print(f"[umhs-train] eval: {json.dumps(evals)}")
    with open(trainer.run_dir / "final_metrics.json", "w") as f:
        json.dump({"train": final_metrics, "eval": evals}, f, indent=2)
    return final_metrics, evals


if __name__ == "__main__":
    main()
