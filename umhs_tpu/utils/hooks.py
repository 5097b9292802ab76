"""NaN / fault detection utilities.

Equivalent of the reference's failure tooling (SURVEY.md §5): the
`check_nan` pipeline flag (-> torch.autograd.set_detect_anomaly,
umhs_pipeline.py:77-78) and the `nan_hook` forward hook
(utils/hooks.py:4-18). JAX-native: `enable_nan_checks` flips the global
jax_debug_nans mode (every jitted function re-runs op-by-op on NaN and
raises at the producing primitive); `assert_finite` is a pytree-wide
finite check usable inside or outside jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def enable_nan_checks(enabled: bool = True) -> None:
    """Global NaN detection (the check_nan config flag)."""
    jax.config.update("jax_debug_nans", enabled)


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite assertion over a pytree (use at step boundaries)."""
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.isfinite(arr).all()):
            raise FloatingPointError(f"non-finite values in {name} leaf {i}")


def checkify_nan(fn):
    """Wrap a jittable fn so NaN outputs raise after the call (jit-safe
    variant of the reference's module forward hook)."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
