#!/usr/bin/env bash
# rgb-only baseline — TPU equivalent of the reference scripts/rgb.sh
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --log-gradients True \
 --pipeline.model.far-plane 1000 \
 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color random \
 --pipeline.datamanager.train-num-rays-per-batch 8192 \
 --pipeline.model.method rgb \
 --data data/processed/ajar \
 --experiment-name rgb \
 --vis console
