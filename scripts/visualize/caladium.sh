#!/usr/bin/env bash
# view / render a trained caladium (141-band Bayspec) run — TPU equivalent of
# the reference scripts/visualize/caladium.sh (ns-viewer + the commented
# ns-render camera-path line).
python -m umhs_tpu.cli.viewer \
 --load-config "outputs/caladium-t0.7-k4/umhsnerf/config.yml"
# offline camera-path render (reference's commented ns-render line):
# python -m umhs_tpu.cli.render camera-path \
#  --load-config "outputs/caladium-t0.7-k4/umhsnerf/config.yml" \
#  --camera-path-filename data/caladium/camera_paths/path.json \
#  --output-path renders/caladium.mp4
