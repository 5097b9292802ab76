#!/usr/bin/env bash
# nerfacto-style RGB baseline — the reference scripts/nerfacto.sh trains
# nerfstudio's nerfacto (proposal-network sampler). The TPU equivalent is the
# rgb method with the proposal sampler (PDF resampling, no occupancy grid).
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --pipeline.model.method rgb \
 --pipeline.model.sampler proposal \
 --pipeline.datamanager.train-num-rays-per-batch 8192 \
 --data data/processed/hotdog \
 --experiment-name nerfacto-baseline --vis console
