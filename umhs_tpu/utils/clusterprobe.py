"""Cosine-similarity cluster probe for unsupervised material segmentation.

Equivalent of the reference `ClusterLookup`
(/root/reference/umhsnerf/utils/clusterprobe.py:5-38), called with the
learned endmembers as the clusters (umhs_model.py:307): normalise rendered
spectra and endmembers, inner products = F_hat @ C_hat^T, probs =
softmax(alpha * ip) (or one-hot argmax when alpha is None).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cluster_probe(
    features: jnp.ndarray,
    clusters: jnp.ndarray,
    alpha: Optional[float] = 0.2,
    log_probs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity classification of features against cluster vectors.

    Args:
        features: (P, C) rendered spectra (or other descriptors).
        clusters: (K, C) cluster centres (the endmember matrix).
        alpha: softmax sharpness; None -> hard one-hot argmax.

    Returns:
        (inner_products (P, K), cluster_probs (P, K)).
    """
    normed_clusters = _l2_normalize(clusters, axis=1)
    normed_features = _l2_normalize(features, axis=1)
    inner_products = normed_features @ normed_clusters.T
    if alpha is None:
        probs = jax.nn.one_hot(
            jnp.argmax(inner_products, axis=1), clusters.shape[0], dtype=jnp.float32
        )
    elif log_probs:
        return inner_products, jax.nn.log_softmax(inner_products * alpha, axis=1)
    else:
        probs = jax.nn.softmax(inner_products * alpha, axis=1)
    return inner_products, probs


# 15-colour class palette for segmentation visualisation
# (reference umhs_model.py:146-162).
CLASS_COLORS = jnp.array(
    [
        [0.49, 0.29, 0.95],
        [0.29, 0.95, 0.30],
        [0.95, 0.29, 0.47],
        [0.29, 0.66, 0.95],
        [0.86, 0.95, 0.29],
        [0.85, 0.29, 0.95],
        [0.29, 0.95, 0.66],
        [0.95, 0.46, 0.29],
        [0.29, 0.30, 0.95],
        [0.50, 0.95, 0.29],
        [0.95, 0.29, 0.69],
        [0.29, 0.88, 0.95],
        [0.95, 0.82, 0.29],
        [0.63, 0.29, 0.95],
        [0.29, 0.95, 0.43],
    ]
)


def label_to_rgb(labels: jnp.ndarray) -> jnp.ndarray:
    """Map integer class labels (...,) to palette colours (..., 3)."""
    return jnp.take(CLASS_COLORS, labels.astype(jnp.int32) % CLASS_COLORS.shape[0], axis=0)
