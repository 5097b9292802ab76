"""Metric writers: console, tensorboard, wandb (availability-gated).

Equivalent of the reference's observability surface (wandb + nerfstudio
writer via --vis, /root/reference/scripts/*.sh use viewer+wandb;
umhs_pipeline.py:82). Metric names match the reference (psnr,
psnr_spectral, num_samples_per_batch, loss/*) so dashboards transfer.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional


class Writer:
    def write(self, step: int, metrics: Dict[str, float]) -> None:
        raise NotImplementedError

    def write_image(self, step: int, name: str, image) -> None:
        """Log an (H, W, 3) float [0,1] image (no-op unless the backend
        supports images — the reference ships gt|pred / depth / accumulation
        composites through its writer, umhs_model.py:407-512)."""

    def close(self) -> None:
        pass


class ConsoleWriter(Writer):
    def __init__(self, log_file: Optional[Path] = None):
        self.log_file = log_file
        if log_file is not None:
            log_file.parent.mkdir(parents=True, exist_ok=True)

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        parts = " ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in sorted(metrics.items())
        )
        line = f"[step {step}] {parts}"
        print(line, flush=True)
        if self.log_file is not None:
            with open(self.log_file, "a") as f:
                f.write(json.dumps({"step": step, "t": time.time(), **metrics}) + "\n")


class TensorboardWriter(Writer):
    def __init__(self, log_dir: Path):
        from torch.utils.tensorboard import SummaryWriter

        self.tb = SummaryWriter(log_dir=str(log_dir))

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            try:
                self.tb.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def write_image(self, step: int, name: str, image) -> None:
        import numpy as np

        self.tb.add_image(
            name, np.clip(np.asarray(image), 0.0, 1.0), step, dataformats="HWC"
        )

    def close(self) -> None:
        self.tb.close()


class WandbWriter(Writer):
    def __init__(self, project: str = "unmixNeRF", name: Optional[str] = None):
        import os

        import wandb

        # default offline (zero-egress environments); override with
        # WANDB_MODE=online for a networked run
        self.run = wandb.init(
            project=project, name=name, mode=os.environ.get("WANDB_MODE", "offline")
        )

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        import wandb

        wandb.log(metrics, step=step)

    def write_image(self, step: int, name: str, image) -> None:
        import numpy as np
        import wandb

        img = (np.clip(np.asarray(image), 0.0, 1.0) * 255).astype(np.uint8)
        wandb.log({name: wandb.Image(img)}, step=step)

    def close(self) -> None:
        self.run.finish()


class MultiWriter(Writer):
    def __init__(self, writers: List[Writer]):
        self.writers = writers

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        for w in self.writers:
            w.write(step, metrics)

    def write_image(self, step: int, name: str, image) -> None:
        for w in self.writers:
            w.write_image(step, name, image)

    def close(self) -> None:
        for w in self.writers:
            w.close()


def make_writer(vis: str, run_dir: Path) -> Writer:
    """Build writers from a '+'-separated vis spec (console/tensorboard/wandb);
    unknown or unavailable backends degrade to console."""
    writers: List[Writer] = []
    for spec in vis.replace(",", "+").split("+"):
        spec = spec.strip()
        try:
            if spec in ("console", "viewer", ""):
                writers.append(ConsoleWriter(run_dir / "metrics.jsonl"))
            elif spec == "tensorboard":
                writers.append(TensorboardWriter(run_dir / "tb"))
            elif spec == "wandb":
                writers.append(WandbWriter(name=run_dir.parent.name))
        except Exception as e:
            print(f"writer '{spec}' unavailable ({e}); falling back to console")
            writers.append(ConsoleWriter(run_dir / "metrics.jsonl"))
    if not writers:
        writers.append(ConsoleWriter(run_dir / "metrics.jsonl"))
    return MultiWriter(writers)
