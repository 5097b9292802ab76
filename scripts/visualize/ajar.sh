#!/usr/bin/env bash
# view / eval a trained ajar run — TPU equivalent of the reference
# scripts/visualize/ajar.sh (ns-viewer --load-config ...).
python -m umhs_tpu.cli.viewer \
 --load-config "outputs/ajar-t0.4-k7/umhsnerf/config.yml"
# offline metrics over the eval split:
# python -m umhs_tpu.cli.eval \
#  --load-config "outputs/ajar-t0.4-k7/umhsnerf/config.yml" \
#  --output-path eval/ajar_metrics.json
