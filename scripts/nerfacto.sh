#!/usr/bin/env bash
# nerfacto-style RGB baseline — the reference scripts/nerfacto.sh trains
# nerfstudio's nerfacto; the closest TPU equivalent today is the rgb method
# (hash field + occupancy marching). A proposal-sampler nerfacto variant is
# on the roadmap.
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --pipeline.model.method rgb \
 --pipeline.datamanager.train-num-rays-per-batch 8192 \
 --data data/processed/hotdog \
 --experiment-name nerfacto-baseline --vis console
