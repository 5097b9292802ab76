#!/usr/bin/env bash
# anacampseros (141-band Bayspec real capture) — TPU equivalent of the
# reference scripts/anacampseros.sh. The reference uses --machine.num-devices 4
# (data parallelism); the TPU build shards the ray batch over ALL chips in the
# mesh automatically — no per-process launcher needed.
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --log-gradients True \
 --pipeline.num_classes 4 \
 --pipeline.model.far-plane 1000 \
 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color black \
 --pipeline.model.spectral_loss_weight 5.0 \
 --pipeline.model.temperature 0.4 \
 --pipeline.model.pred_dino False \
 --pipeline.model.pred_specular True \
 --pipeline.model.load_vca True \
 --pipeline.datamanager.train-num-rays-per-batch 2048 \
 --pipeline.datamanager.eval-num-rays-per-batch 256 \
 --pipeline.datamanager.hs-dtype bfloat16 \
 --pipeline.model.method rgb+spectral \
 --data data/hsnerf/bayspec/anacampseros/processed_dataset \
 --experiment-name "anacampseros-t0.7-k4" \
 --vis console
