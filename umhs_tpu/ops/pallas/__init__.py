"""Pallas TPU kernels for the hot compute paths.

- mlp_fused: the reference field's tiny head MLPs as one fused VMEM-resident
  chain per sample tile (tcnn fully-fused-MLP analogue), with a custom VJP
  that recomputes activations on-chip and accumulates dW across the grid.
"""

from .mlp_fused import mlp_apply_fused

__all__ = ["mlp_apply_fused"]
