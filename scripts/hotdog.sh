#!/usr/bin/env bash
# hotdog rgb+spectral run — TPU equivalent of the reference scripts/hotdog.sh
# (flags map 1:1; tcnn/images-on-gpu flags are accepted and inert).
python -m umhs_tpu.cli.train umhsnerf \
 --steps_per_save 1000 --save_only_latest_checkpoint False --machine.seed 42 \
 --log-gradients True --pipeline.num_classes 6 --pipeline.model.far-plane 1000 \
 --pipeline.model.near_plane 0.05 --pipeline.model.background-color random \
 --pipeline.model.spectral_loss_weight 5.0 --pipeline.model.temperature 0.4 \
 --pipeline.model.pred_dino False --pipeline.model.pred_specular True \
 --pipeline.model.load_vca True \
 --pipeline.datamanager.train-num-rays-per-batch 4096 \
 --pipeline.model.method rgb+spectral \
 --data data/processed/hotdog --experiment-name hotdog-t0.4-k6-specular \
 --vis console
