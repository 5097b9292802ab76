#!/usr/bin/env bash
# joint rgb+spectral supervision — reference scripts/rgb+spectral.sh
# (4-GPU + gradient accumulation in the reference; the TPU mesh shards rays
# across all chips and --gradient-accumulation_steps maps to optax.MultiSteps).
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 --gradient-accumulation_steps 3 \
 --pipeline.model.far-plane 1000 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color random \
 --pipeline.model.spectral_loss_weight 5.0 --pipeline.model.temperature 0.4 \
 --pipeline.model.pred_specular True --pipeline.model.load_vca True \
 --pipeline.datamanager.train-num-rays-per-batch 2048 \
 --pipeline.model.method rgb+spectral --data data/processed/ajar \
 --experiment-name "rgb+spectral" --vis console
