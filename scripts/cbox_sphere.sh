#!/usr/bin/env bash
# cbox_sphere Cornell-box spectral scene — reference scripts/cbox_sphere.sh.
python -m umhs_tpu.cli.train umhsnerf \
 --steps_per_save 1000 --machine.seed 42 \
 --pipeline.num_classes 5 \
 --pipeline.model.far-plane 1000 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color random \
 --pipeline.model.spectral_loss_weight 5.0 --pipeline.model.temperature 0.4 \
 --pipeline.model.pred_specular True --pipeline.model.load_vca True \
 --pipeline.datamanager.train-num-rays-per-batch 4096 \
 --pipeline.model.method rgb+spectral \
 --data data/processed/cbox_sphere --experiment-name cbox_sphere \
 --vis console
