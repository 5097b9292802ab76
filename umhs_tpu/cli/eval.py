"""`umhs-eval` — the ns-eval equivalent.

Reference surface: `ns-eval --load-config outputs/.../config.yml`
(/root/reference/scripts/visualize/hotdog.sh:3-10): reload the run config +
latest checkpoint and report averaged eval-image metrics.

Usage:
    python -m umhs_tpu.cli.eval --load-config outputs/exp/umhsnerf/config.yml \
        [--output-path metrics.json] [--load-step N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from ..configs import load_config
    from ..engine.trainer import Trainer

    opts = {}
    i = 0
    while i < len(argv):
        key = argv[i].lstrip("-").replace("-", "_")
        opts[key] = argv[i + 1]
        i += 2
    assert "load_config" in opts, "--load-config is required"

    config = load_config(Path(opts["load_config"]))
    trainer = Trainer(
        config.trainer,
        config.pipeline.model,
        config.pipeline.datamanager,
        num_classes=config.pipeline.num_classes,
    )
    trainer.setup()
    load_step = int(opts["load_step"]) if "load_step" in opts else None
    trainer.load_checkpoint(trainer.checkpoint_dir, load_step)

    metrics = trainer.eval_all_images()
    result = {
        "experiment_name": config.trainer.experiment_name,
        "checkpoint_step": trainer.step,
        "results": metrics,
    }
    print(json.dumps(result, indent=2))
    out = Path(opts.get("output_path", trainer.run_dir / "eval_metrics.json"))
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
