#!/usr/bin/env bash
# view a trained anacampseros (141-band Bayspec) run — TPU equivalent of the
# reference scripts/visualize/anacampseros.sh (ns-viewer --load-config ...).
python -m umhs_tpu.cli.viewer \
 --load-config "outputs/anacampseros-t0.7-k4/umhsnerf/config.yml"
