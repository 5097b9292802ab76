"""On-TPU A/B: Pallas fused-chain MLP kernel vs plain XLA MLP, at the
production head shapes of the flagship bench config.

The fused kernel (ops/pallas/mlp_fused.py) auto-enables on TPU backends
(ops/mlp.py:84-86). This probe is the evidence that the auto-enable is a
win (or at least not a regression) — it times forward and forward+grad of
every field head MLP (the TPU analogue of tcnn's fully-fused MLPs,
/root/reference/umhsnerf/umhs_field.py:22,67-113) in both modes at the
compact-sample batch size of the production bench.

Run:  python scripts/probe_mlp_fused.py [--batch N] [--iters K]
Writes one line per (head, mode, arm): wall ms per call.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from umhs_tpu.models.field import FieldConfig
from umhs_tpu.ops.mlp import apply_mlp, init_mlp


def _time(fn, *args, iters: int) -> float:
    """Median wall ms/call; run-then-fetch (axon relay does not honour
    block_until_ready — fetching a scalar is the sync point)."""
    out = fn(*args)
    float(jnp.ravel(out)[0])  # compile + sync
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        float(jnp.ravel(out)[0])
        times.append(time.time() - t0)
    return float(np.median(times)) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=253_952,
                    help="compact-sample rows (production stage budgets sum)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    # bench flagship config: 6 classes + specular head, 128 bands
    cfg = FieldConfig(num_classes=6, num_bands=128, pred_specular=True,
                      method="rgb+spectral")
    n = args.batch
    heads = {
        "mlp_base": (cfg.hash.output_dim, cfg.base_mlp_layers,
                     cfg.base_mlp_width, 1 + cfg.geo_feat_dim),
        "feature_mlp": (cfg.posenc_dim + cfg.geo_feat_dim, 3,
                        cfg.hidden_dim_color, cfg.num_classes + 1),
        "mlp_head": (cfg.posenc_dim + cfg.geo_feat_dim, cfg.num_layers_color,
                     cfg.hidden_dim_color, cfg.num_classes),
        "mlp_directional": (cfg.sh_dim + cfg.posenc_dim, 2, 16, cfg.num_bands),
    }

    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}  batch={n:,}  iters={args.iters}")
    for name, (in_dim, layers, width, out_dim) in heads.items():
        key, pk, xk = jax.random.split(key, 3)
        params = init_mlp(pk, in_dim=in_dim, num_layers=layers,
                          layer_width=width, out_dim=out_dim)
        x = jax.random.normal(xk, (n, in_dim), dtype=jnp.float32)

        for fused in (False, True):
            fwd = jax.jit(lambda p, v, f=fused: apply_mlp(
                p, v, compute_dtype=jnp.bfloat16, fused=f))
            ms_f = _time(fwd, params, x, iters=args.iters)

            def loss(p, v, f=fused):
                return jnp.sum(apply_mlp(p, v, compute_dtype=jnp.bfloat16,
                                         fused=f) ** 2)

            bwd = jax.jit(jax.grad(loss))
            ms_b = _time(lambda p, v: bwd(p, v)["layers"][0]["w"], params, x,
                         iters=args.iters)
            arm = "fused" if fused else "xla  "
            print(f"{name:16s} {arm}  in={in_dim:3d} L{layers}xW{width:3d} "
                  f"out={out_dim:3d}   fwd {ms_f:7.2f} ms   grad {ms_b:7.2f} ms")

        # parity check between the two paths (bf16 compute: loose tol)
        a = apply_mlp(params, x, compute_dtype=jnp.bfloat16, fused=False)
        b = apply_mlp(params, x, compute_dtype=jnp.bfloat16, fused=True)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"{name:16s} max |xla - fused| = {err:.3e}")


if __name__ == "__main__":
    main()
