#!/usr/bin/env bash
# Plain Instant-NGP (RGB) baseline — equivalent of the reference
# scripts/instantngp.sh (ns-train instant-ngp): the umhsnerf 'rgb' method IS
# the Instant-NGP configuration (hash-grid field + occupancy marching).
python -m umhs_tpu.cli.train umhsnerf \
 --machine.seed 42 \
 --pipeline.model.method rgb \
 --pipeline.datamanager.train-num-rays-per-batch 8192 \
 --data data/processed/hotdog \
 --experiment-name instantngp-baseline \
 --vis console
