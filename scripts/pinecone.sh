#!/usr/bin/env bash
# pinecone (141-band Bayspec real capture) — reference scripts/pinecone.sh.
# (Reference uses --machine.num-devices 4; the TPU mesh shards automatically.)
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 --pipeline.num_classes 4 \
 --pipeline.model.far-plane 1000 --pipeline.model.near_plane 0.05 \
 --pipeline.model.background-color black \
 --pipeline.model.spectral_loss_weight 5.0 --pipeline.model.temperature 0.7 \
 --pipeline.model.pred_specular True --pipeline.model.load_vca True \
 --pipeline.datamanager.train-num-rays-per-batch 2048 \
 --pipeline.datamanager.eval-num-rays-per-batch 256 \
 --pipeline.datamanager.hs-dtype bfloat16 \
 --pipeline.model.method rgb+spectral \
 --data data/hsnerf/bayspec/pinecone/processed_dataset \
 --experiment-name "pinecone-t0.7-k4" --vis console
