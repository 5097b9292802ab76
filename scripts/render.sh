#!/usr/bin/env bash
# camera-path render — TPU equivalent of the reference scripts/render.sh
python -m umhs_tpu.cli.render camera-path \
 --load-config "outputs/hotdog-t0.4-k6-specular/umhsnerf/config.yml" \
 --camera-path-filename "data/processed/hotdog/camera_paths/hotdog.json" \
 --output-path renders/hotdog/hotdog.mp4 \
 --rendered-output-names "rgb" "abundances_0" "abundances_1" "abundances_2" "abundances_3" "abundances_4" "abundances_5"
