#!/usr/bin/env python
"""Run-to-run quality variance: N seeds of a reduced quality run.

VERDICT r2 noted the flagship quality number is n=1. The full
reference-scale run costs ~96 min/seed on one chip; this study measures
seed-to-seed variance at a reduced (but same-code-path) envelope —
quality_reference_scale.py with --steps/--image-size lowered — and
reports per-metric mean ± spread across seeds, written to
docs/seed_variance.json.

Usage: python scripts/quality_seed_variance.py [--seeds 42 43 44]
       [--steps 3000] [--image-size 256]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--out", type=Path, default=REPO / "docs" / "seed_variance.json")
    args = ap.parse_args()

    runs = []
    for seed in args.seeds:
        out = Path(tempfile.mkdtemp(prefix="umhs_seedvar_")) / f"seed{seed}.json"
        cmd = [
            sys.executable, str(REPO / "scripts" / "quality_reference_scale.py"),
            "--steps", str(args.steps), "--image-size", str(args.image_size),
            "--views", str(args.views), "--seed", str(seed), "--out", str(out),
        ]
        print(f"# seed {seed}: {' '.join(cmd)}", file=sys.stderr)
        subprocess.run(cmd, check=True)
        runs.append((seed, json.loads(out.read_text())))

    metrics = sorted(runs[0][1]["eval_all_images"].keys())
    summary = {}
    for m in metrics:
        vals = [r["eval_all_images"][m] for _, r in runs]
        summary[m] = {
            "mean": round(statistics.fmean(vals), 5),
            "min": round(min(vals), 5),
            "max": round(max(vals), 5),
            "stdev": round(statistics.stdev(vals), 6) if len(vals) > 1 else 0.0,
        }
    result = {
        "config": {
            "steps": args.steps,
            "image_size": args.image_size,
            "views": args.views,
            "seeds": args.seeds,
            "note": "reduced envelope of quality_reference_scale.py; "
                    "same code path as the flagship n=1 run",
        },
        "per_seed": {str(s): r["eval_all_images"] for s, r in runs},
        "summary": summary,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(summary))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
