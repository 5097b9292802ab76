"""umhs_tpu — TPU-native unsupervised hyperspectral NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Factral/unsupervised-hyperspectral-nerf (UnMix-NeRF): Instant-NGP-style
hash-grid NeRF whose per-point radiance is a linear spectral mixture over a
globally learned endmember matrix, with occupancy-grid ray marching, CIE
spectrum->RGB projection, VCA endmember initialisation, and unsupervised
material segmentation by spectral cosine similarity.

Unlike the reference (a nerfstudio plugin over torch/CUDA: nerfacc +
tiny-cuda-nn), this framework is a flat functional design: pure field /
render functions over parameter pytrees, a single pjit-compiled train step,
fixed-shape padded ray samples instead of packed variable-length tensors,
and data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
