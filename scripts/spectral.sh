#!/usr/bin/env bash
# spectral-only run — TPU equivalent of the reference scripts/spectral.sh
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --log-gradients True \
 --pipeline.model.far-plane 1000 \
 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color last_sample \
 --pipeline.datamanager.train-num-rays-per-batch 8192 \
 --pipeline.model.method spectral \
 --data data/processed/ajar \
 --experiment-name "spectral only try" \
 --vis console
