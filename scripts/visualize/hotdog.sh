#!/usr/bin/env bash
# eval a trained hotdog run — TPU equivalent of the reference
# scripts/visualize/hotdog.sh (ns-eval --load-config ...).
python -m umhs_tpu.cli.eval \
 --load-config "outputs/hotdog-t0.4-k6-specular/umhsnerf/config.yml" \
 --output-path eval/hotdog_metrics.json
