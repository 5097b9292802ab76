"""Training engine: fused jit train step, callbacks, eval, checkpointing.

TPU-native replacement for the slice of nerfstudio's Trainer + the reference
UMHSPipeline the method exercises (/root/reference/umhsnerf/umhs_config.py:35-67,
umhs_pipeline.py:53-178): 30k-step loop, Adam(2e-2, eps 1e-15) with
exponential decay to 1e-5, occupancy-grid update callback before each
iteration (every 16 steps), endmember clamping after each iteration,
periodic eval batches / images, checkpoint save/load.

The torch loop (dataloader -> model -> GradScaler.backward -> step) becomes
ONE donated jit: pixel sampling, ray generation, marching, field, losses,
grads and the optax update all fuse into a single XLA program per step.
bf16 on TPU needs no loss scaling, so mixed_precision maps to a compute
dtype, not a GradScaler. Under a multi-chip mesh the ray batch is sharded
on the batch axis and parameters replicated; jit inserts the grad psum.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datamanager import DataManagerConfig, UMHSDataManager, sample_pixel_batch
from ..models.model import ModelConfig, UMHSModel
from ..parallel.mesh import (
    make_eval_forward,
    make_grad_fn,
    make_mesh,
    put_replicated,
    shard_rays,
)
from ..utils import metrics as metrics_utils
from ..utils.writer import Writer, make_writer


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 2e-2
    eps: float = 1e-15
    lr_final: float = 1e-5
    max_steps: int = 30000
    warmup_steps: int = 0


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    method_name: str = "umhsnerf"
    experiment_name: str = "unnamed"
    output_dir: Path = Path("outputs")
    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 2000
    steps_per_log: int = 100
    save_only_latest_checkpoint: bool = False
    # checkpoint when a train() call reaches its target step. Callers that
    # drive the loop in short slices (bench.py, tests) disable this: each
    # slice's end is `self.step == total_iters`, and an orbax save per slice
    # (~1 min of host serialization at production param sizes) would swamp
    # the measurement window.
    save_final: bool = True
    mixed_precision: bool = True
    gradient_accumulation_steps: int = 1
    seed: int = 42
    use_mesh: bool = True
    log_gradients: bool = False
    vis: str = "console"  # console | tensorboard | wandb (comma-separable)
    load_dir: Optional[Path] = None
    load_step: Optional[int] = None
    eval_seg_dump_dir: Optional[Path] = None  # reference dumps seg_pred PNGs
    # emit gt|pred / depth / accumulation composites per eval image, both
    # through the writer (tensorboard/wandb images) and as PNGs under
    # run_dir/eval_images/ (reference umhs_model.py:407-512)
    save_eval_images: bool = True
    # Dynamic batch sizing (the reference's DynamicBatchPipeline semantics,
    # umhs_pipeline.py:47-50 commented target_num_samples=1<<18): once the
    # occupancy grid converges, mean samples/ray collapses (~64 -> ~16); the
    # trainer then shrinks the padded per-ray sample budget and grows the ray
    # batch to keep ~target_num_samples per step — cutting the static-shape
    # padding waste that a CUDA packed layout never pays.
    dynamic_batching: bool = True
    target_num_samples: int = 1 << 18
    adapt_steps: Tuple[int, ...] = (512, 2048)
    # Periodic re-adaptation: after the one-shot adapt_steps, re-check every
    # `adapt_every` steps and re-size (rays, samples/ray, compact budget)
    # whenever measured mean samples/ray drifts more than `adapt_drift` from
    # the value the current budget was sized for. The occupancy grid keeps
    # pruning long after the scheduled adapts, leaving the compact buffer
    # (and the padded march lanes) ~2x oversized — pure gather/scatter waste
    # on the hash table, the dominant step cost. 0 disables.
    adapt_every: int = 1024
    adapt_drift: float = 0.2
    # Fuse the steady-state (partial) occupancy EMA update into the head of
    # the train chunk dispatch. The separate occ dispatch was measured at
    # ~1.9 s/call in-trainer vs ~0.7 s standalone — the gap is the extra
    # device dispatch (tunnel round trip) plus the donation round trip of
    # the ~110 MB occ buffers. Fused, the update rides the chunk's single
    # dispatch. Warmup FULL updates stay a separate dispatch: fusing the
    # 8.4M-probe full variant into the scanned fwd+bwd chunk was measured
    # to blow up XLA compile time catastrophically (docs/PERFORMANCE.md).
    fuse_occ_update: bool = True
    # Tiered XLA compilation of the train chunk (round-4 cold-start fix).
    # The scanned fwd+bwd chunk hits a pathological XLA pass once wrapped in
    # a while loop: measured 391-410 s backend compile at ANY scan length
    # >= 2 (vs 29 s at length 1, where XLA unrolls the loop away; full
    # unrolling of 16 steps is 601 s — worse). Lowering XLA's
    # exec_time_optimization_effort to -1.0 compiles the same chunk in 55 s.
    # Every new chunk shape is first compiled at `fast_compile_effort` so
    # training starts ~7x sooner; with `background_full_compile` the
    # default-effort executable also compiles in a daemon thread and is
    # hot-swapped in when ready (both phases produce identical trajectories
    # — same HLO program, different backend scheduling). None disables the
    # fast tier. Tiering engages only on TPU backends; CPU (tests) uses the
    # plain jit path. Measurements: docs/PERFORMANCE.md round 4.
    fast_compile_effort: Optional[float] = -1.0
    background_full_compile: bool = True
    # chunk dispatches a shape must serve before its default-effort
    # background compile starts (see _ChunkExec deferral): shapes retired
    # by dynamic-batch adaptation within the window never pay the ~400 s
    # server-side compile (which would also contend with the next shape's
    # prefetch compile in the compile service)
    full_compile_defer_chunks: int = 3
    # Non-blocking dynamic-batch adaptation: when > 0, an adapt DECIDES its
    # new (rays, samples/ray, stage budgets) at the scheduled step but
    # APPLIES them `adapt_prefetch_steps` later; in between, training
    # continues at the old shape while the new shape's chunk executable
    # compiles in a background thread (the compile service runs compiles
    # concurrently with in-flight dispatches). Application is pinned to the
    # fixed later boundary whether or not the compile has landed (it blocks
    # if not), so the trajectory stays deterministic — a cold machine and a
    # compile-cache-warm machine train the identical sequence of shapes at
    # the identical steps. 0 = decide and apply at the same boundary
    # (blocking compile), the previous behaviour. One decision is in
    # flight at a time: a scheduled adapt step that falls inside a pending
    # window is skipped (space adapt_steps > adapt_prefetch_steps apart),
    # and periodic drift re-adapts simply fire at the next crossing.
    # Default 96 (round-5 promotion of the bench-verified value): at the
    # production schedule (adapt_steps 512/2048 over 30k iterations) a
    # 96-step deferral is trajectory-negligible, and without it every rung
    # application blocks on a ~50 s foreground fast-tier compile — the plain
    # CLI train path paid the full cold-start cost the bench had engineered
    # away. Tests that assert apply-at-decide semantics pin this to 0.
    adapt_prefetch_steps: int = 96
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)


# Tracing (`jitted.lower`) is Python-side and GIL-bound: on this class of
# single-CPU host, N concurrent prefetched builds slow EVERY lower ~N-7x
# (measured 63-205 s concurrent vs 4-9 s alone — cold-run logs, round 4)
# and the first-needed executable lands last. Serializing the trace while
# leaving the backend compile (a GIL-releasing RPC into the compile
# service, which runs compiles concurrently) outside the lock keeps the
# build pipeline: trace sequentially in start order, compile in parallel.
_TRACE_LOCK = threading.Lock()


class _ChunkExec:
    """Two-tier compiled executable for one train-chunk shape.

    Tier 1 ("fast"): AOT-compiled with a lowered XLA
    exec_time_optimization_effort — available in ~55 s instead of ~410 s at
    bench shapes (docs/PERFORMANCE.md round 4), so a cold start reaches its
    first optimizer step in minutes, not tens of minutes. Tier 2 ("full"):
    the default-effort executable, compiled from the SAME lowering in a
    daemon thread (the backend compile is an RPC/GIL-releasing call) and
    hot-swapped in once ready. Both tiers execute the identical HLO program
    — only backend scheduling differs — so the training trajectory is
    unchanged by the swap.

    NOTE on swap-step determinism (advisor finding, round 4): the
    "identical trajectory" claim is an assumption about XLA's
    exec_time_optimization_effort knob — that it changes instruction
    scheduling/overlap but not fusion-level float rounding. It cannot be
    runtime-checked cheaply here because chunk args are DONATED (a second
    dispatch of the same state through the other executable would read
    freed buffers, and cloning ~GB of state per swap defeats the point).
    Empirical standing: the round-3/4 bench trajectories (which hot-swap
    mid-run at a wall-clock-dependent step) reproduced their training-PSNR
    curves and their restored-checkpoint hashes across runs on this XLA
    version; treat the identity as verified-per-XLA-version and re-check
    the fixed-seed bench PSNR trace after any jax/libtpu upgrade.

    The background compile is DEFERRED until the shape has served
    `defer_calls` chunk dispatches: dynamic-batch adaptation retires early
    shapes within a few chunks, and a 400 s server-side compile of a
    retired shape would also queue ahead of the next shape's fast compile.
    A shape that survives the deferral window is the one training will sit
    in, so the full-effort executable (measured 1.53x faster at bench
    shapes) is worth its compile.

    With `prefetch=True` the fast-tier build (trace + backend compile) runs
    in a background thread so training can CONTINUE at the current shape
    while the next adapted shape compiles (the compile service runs compiles
    concurrently — measured 56 s fast compile while a 448 s default compile
    was in flight). The first `__call__` joins the build thread, so using
    the executable before the build lands simply blocks — the training
    trajectory is identical either way.

    Falls back to the plain jit call path when the fast tier is disabled,
    the backend rejects the option, or the backend is CPU (tests)."""

    def __init__(self, jitted, example_args, fast_effort, background_full,
                 defer_calls: int = 3, prefetch: bool = False,
                 tag: str = ""):
        self._jitted = jitted
        self._fast = None
        self._full = None
        self._lowered = None
        self._background_full = background_full
        self._defer_calls = defer_calls
        self._calls = 0
        self._bg_started = False
        self._build_thread = None
        self._tag = tag
        use_fast = (
            fast_effort is not None and jax.default_backend() != "cpu"
        )
        if not use_fast:
            return

        def _build():
            try:
                t_q = time.time()
                with _TRACE_LOCK:
                    t0 = time.time()
                    self._lowered = jitted.lower(*example_args)
                    t1 = time.time()
                self._fast = self._lowered.compile(
                    {"exec_time_optimization_effort": float(fast_effort)}
                )
                queued = f"queued {t0 - t_q:.0f}s + " if t0 - t_q > 1.0 else ""
                print(
                    f"[trainer] fast-tier compile{self._tag}: {queued}"
                    f"lower {t1 - t0:.0f}s + backend {time.time() - t1:.0f}s"
                )
            except Exception as e:  # noqa: BLE001 — unsupported option etc.
                print(f"[trainer] fast-tier compile unavailable: {e!r}")
                self._fast = None

        if prefetch:
            import threading

            self._build_thread = threading.Thread(target=_build, daemon=True)
            self._build_thread.start()
        else:
            _build()

    def ready(self) -> bool:
        """True once the (possibly prefetched) build has finished."""
        return self._build_thread is None or not self._build_thread.is_alive()

    def _start_background_full(self):
        import threading

        self._bg_started = True
        lowered = self._lowered

        def _bg():
            try:
                t0 = time.time()
                full = lowered.compile()
                self._full = full
                print(
                    f"[trainer] full-effort compile{self._tag}: "
                    f"{time.time() - t0:.0f}s (hot-swapped)"
                )
            except Exception as e:  # noqa: BLE001
                print(f"[trainer] background full compile failed: {e!r}")

        threading.Thread(target=_bg, daemon=True).start()

    def __call__(self, *args):
        if self._build_thread is not None:
            t0 = time.time()
            self._build_thread.join()
            self._build_thread = None
            if time.time() - t0 > 1.0:
                print(
                    f"[trainer] joined prefetched build{self._tag}: "
                    f"waited {time.time() - t0:.0f}s"
                )
        if self._fast is None:
            return self._jitted(*args)
        self._calls += 1
        if (
            self._background_full
            and not self._bg_started
            and self._calls >= self._defer_calls
        ):
            self._start_background_full()
        ex = self._full or self._fast
        if self._calls == 1:
            t0 = time.time()
            out = ex(*args)
            dt = time.time() - t0
            if dt > 5.0:
                print(f"[trainer] first dispatch{self._tag}: {dt:.0f}s")
            return out
        return ex(*args)


def make_lr_schedule(cfg: OptimizerConfig):
    """nerfstudio ExponentialDecayScheduler: lr = init*(final/init)^(t/T)."""
    sched = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.max_steps,
        decay_rate=cfg.lr_final / cfg.lr,
        # nerfstudio's ExponentialDecayScheduler clamps at lr_final; without
        # end_value training past max_steps keeps decaying below it
        end_value=cfg.lr_final,
    )
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


class Trainer:
    """Owns the datamanager, model descriptor, optimizer and training state."""

    def __init__(
        self,
        config: TrainerConfig,
        model_config: ModelConfig,
        datamanager_config: DataManagerConfig,
        num_classes: int = 5,
    ):
        self.config = config
        if config.mixed_precision and model_config.compute_dtype == "float32":
            model_config = dataclasses.replace(model_config, compute_dtype="bfloat16")
        self.datamanager = UMHSDataManager(datamanager_config, num_classes=num_classes)

        meta = self.datamanager.metadata
        self.model = UMHSModel(
            model_config,
            wavelengths=meta.get("wavelengths") or [],
            num_classes=meta.get("num_classes", num_classes),
            num_images=self.datamanager.num_train_images,
            scene_scale=self.datamanager.train_outputs.scene_scale,
        )
        self.model_config = model_config

        self.lr_schedule = make_lr_schedule(config.optimizer)
        self.optimizer = optax.chain(
            optax.scale_by_adam(eps=config.optimizer.eps),
            optax.scale_by_learning_rate(self.lr_schedule),
        )
        if config.gradient_accumulation_steps > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, config.gradient_accumulation_steps
            )

        self.mesh = make_mesh() if config.use_mesh else None
        self.writer: Writer = make_writer(config.vis, self.run_dir)
        self._train_step_fn = None
        self._forward_fn = None
        self.step = 0
        self._last_n = 0

    # ------------------------------------------------------------------
    @property
    def run_dir(self) -> Path:
        return (
            Path(self.config.output_dir)
            / self.config.experiment_name
            / self.config.method_name
        )

    @property
    def checkpoint_dir(self) -> Path:
        return self.run_dir / "umhs_models"

    # ------------------------------------------------------------------
    def setup(self, endmembers_init: Optional[np.ndarray] = None):
        """Initialise params/optimizer/occupancy; stage data on device."""
        key = jax.random.PRNGKey(self.config.seed)
        if (
            endmembers_init is None
            and self.model_config.load_vca
            and os.path.exists(self.datamanager.config.dataparser.vca_cache)
        ):
            endmembers_init = np.load(self.datamanager.config.dataparser.vca_cache)
        params, occ_state = self.model.init(key, endmembers_init)
        opt_state = self.optimizer.init(params)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "occ": occ_state,
            "step": jnp.zeros((), jnp.int32),
            "rng": jax.random.PRNGKey(self.config.seed + 1),
        }
        if self.mesh is not None:
            self.state = put_replicated(self.state, self.mesh)
        self.train_data, self.train_cam = self.datamanager.train_device_data()
        if self.mesh is not None:
            self.train_data = put_replicated(self.train_data, self.mesh)
            self.train_cam = put_replicated(self.train_cam, self.mesh)
        if self.config.load_dir is not None:
            self.load_checkpoint(self.config.load_dir, self.config.load_step)
        return self

    # ------------------------------------------------------------------
    def _build_train_step(self, batch_size: Optional[int] = None, march_cfg=None,
                          compact_budget: Optional[int] = None):
        model = self.model
        optimizer = self.optimizer
        batch_size = batch_size or self.datamanager.config.train_num_rays_per_batch
        mesh = self.mesh

        patch_size = self.datamanager.config.patch_size
        cam_type = self.datamanager.train_outputs.cameras.camera_type
        log_gradients = self.config.log_gradients
        # gradient computation: shard-local under the mesh (marching,
        # compaction and field eval never reshard; only a grads pmean +
        # sample-count psum cross the ICI — see parallel/mesh.make_grad_fn)
        grad_fn = make_grad_fn(
            model, mesh, march_cfg=march_cfg, compact_budget=compact_budget
        )

        def train_step(state, data, cam):
            # RNG lives in the donated state: the host loop issues zero
            # device ops per step (each un-jitted op costs a full dispatch
            # round trip — ~0.7 s through the remote-TPU tunnel).
            rng, k_sample, k_march, k_bg = jax.random.split(state["rng"], 4)
            rays, batch = sample_pixel_batch(
                data, cam, k_sample, batch_size, patch_size=patch_size,
                camera_type=cam_type,
            )
            total, loss_dict, metrics, grads = grad_fn(
                state["params"], state["occ"], rays, batch,
                k_march, k_bg, state["step"],
            )
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            params = model.post_step(params)  # endmember clamp

            metrics.update({f"loss/{k}": v for k, v in loss_dict.items()})
            metrics["loss/total"] = total
            if log_gradients:
                # reference scripts pass --log-gradients True everywhere
                # (scripts/*.sh); nerfstudio logs per-group grad norms —
                # here the global norm plus the two dominant groups
                metrics["grad_norm/total"] = optax.global_norm(grads)
                if "hash_table" in grads:
                    metrics["grad_norm/hash_table"] = optax.global_norm(
                        grads["hash_table"]
                    )
                if "endmembers" in grads:
                    metrics["grad_norm/endmembers"] = optax.global_norm(
                        grads["endmembers"]
                    )
            new_state = {
                "params": params,
                "opt_state": opt_state,
                "occ": state["occ"],
                "step": state["step"] + 1,
                "rng": rng,
            }
            return new_state, metrics

        return train_step

    def _build_train_chunk(self, num_steps: int, batch_size: Optional[int] = None,
                           march_cfg=None, compact_budget: Optional[int] = None,
                           fuse_occ: bool = False):
        """`num_steps` train steps fused into ONE dispatch via lax.scan.

        A host-side step loop pays a full client->relay->TPU dispatch round
        trip per iteration (hundreds of ms through the remote tunnel, and
        real overhead even on directly-attached chips). Scanning the step on
        device makes dispatch cost amortise to ~0. Metrics from the last
        step of the chunk are returned (matching the reference's
        steps_per_log-style sampling of train metrics).

        The occupancy EMA update (BEFORE_TRAIN_ITERATION callback, nerfacc
        update_every_n_steps — /root/reference/umhsnerf/umhs_model.py:549-554)
        deliberately stays a SEPARATE jitted dispatch (_build_occ_update):
        fusing it into this chunk was measured to blow up compilation
        catastrophically (trace alone 60 s, backend compile >6 min for the
        warmup full-update variant — the occ update's chunked density map
        plus the 16-step scanned fwd+bwd in one XLA module). The separate fn
        donates the occ buffers instead, which is the part of the fusion
        that mattered for memory traffic.
        """
        step_fn = self._build_train_step(batch_size, march_cfg, compact_budget)
        model = self.model
        occ_base_key = jax.random.PRNGKey(self.config.seed + 2)

        def chunk(state, data, cam):
            if fuse_occ:
                # partial occupancy EMA update fused into the chunk's single
                # dispatch (same RNG stream as _build_occ_update so the
                # trajectory is independent of the fusion choice)
                occ = model.update_occupancy(
                    state["occ"],
                    state["params"],
                    jax.random.fold_in(occ_base_key, state["step"]),
                    full=False,
                )
                state = dict(state, occ=occ)
            # ALL steps inside the scan; metrics of the last step are read
            # from the stacked scan outputs (scalars — bytes). Unrolling the
            # last step for its metrics instead would inline the whole
            # fwd+bwd graph a SECOND time and double the XLA compile of the
            # chunk (measured minutes at production shapes via the remote
            # tunnel).
            def body(st, _):
                st, metrics = step_fn(st, data, cam)
                return st, metrics

            state, ms = jax.lax.scan(body, state, None, length=num_steps)
            metrics = jax.tree.map(lambda x: x[-1], ms)
            return state, metrics

        return jax.jit(chunk, donate_argnums=(0,))

    def _build_occ_update(self, full: bool):
        """Separate jitted occupancy update (one jit per `full` variant);
        donates the occ-state buffers (binaries + EMA grids + row/packed
        tables, ~110 MB at the reference 128^3 x 4 config) so the update
        writes in place instead of allocating a second copy."""
        model = self.model
        base_key = jax.random.PRNGKey(self.config.seed + 2)

        def update(occ, params, step):
            rng = jax.random.fold_in(base_key, step)
            return model.update_occupancy(occ, params, rng, full=full)

        return jax.jit(update, donate_argnums=(0,))

    def _occ_update(self, full: bool, prefetch: bool = False):
        """Tiered executable for the occupancy update. The full (warmup)
        variant's chunked density map hits the same while-loop compile
        pathology as the train chunk: measured 411 s default-effort backend
        compile vs 12 s at effort -1.0 (docs/PERFORMANCE.md round 4). The
        full variant never gets a background default-effort compile — it
        only runs during the 256-step occupancy warmup, which is over long
        before a 411 s compile could land; the partial variant (used when
        fuse_occ_update=False) runs for the whole training and does."""
        if not hasattr(self, "_occ_update_tiers"):
            self._occ_update_tiers = {}
        if full not in self._occ_update_tiers:
            self._occ_update_tiers[full] = _ChunkExec(
                self._build_occ_update(full),
                (self.state["occ"], self.state["params"], 0),
                self.config.fast_compile_effort,
                self.config.background_full_compile and not full,
                defer_calls=self.config.full_compile_defer_chunks,
                prefetch=prefetch,
                tag=f" occ_update(full={full})",
            )
        return self._occ_update_tiers[full]

    def _build_forward(self, train: bool = False):
        """Inference forward, ray-sharded over the mesh (eval renders the
        local shard per chip, like training; reference DP semantics,
        ignore.py:109-111)."""
        fwd = make_eval_forward(self.model, self.mesh)

        def forward(state, rays, rng):
            return fwd(state["params"], state["occ"], rays, rng, state["step"])

        return jax.jit(forward, static_argnames=())

    # ------------------------------------------------------------------
    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        """Run the training loop; returns the last logged metrics.

        Structure: the host loop advances in chunks of the occupancy-update
        interval (16 steps) — each chunk is one device dispatch (lax.scan) —
        with the occupancy EMA update between chunks. Periodic actions
        (logging, endmember dump, eval, save) fire at the first chunk
        boundary at/after their nominal schedule.
        """
        cfg = self.config
        interval = self.model.occ_config.update_interval
        self._init_dyn()
        total_iters = num_iterations or cfg.max_num_iterations
        if (
            self.step == 0
            and not self._chunk_fns
            and cfg.fast_compile_effort is not None
            and jax.default_backend() != "cpu"
        ):
            # cold start: kick off the first chunk's and both occ-update
            # variants' builds CONCURRENTLY before the loop needs them —
            # their backend compiles overlap in the compile service
            # (~40-50 s saved of a cold start's serial 52+12+31 s;
            # docs/PERFORMANCE.md round 4). Normally this already happened
            # at setup() time, overlapped with init/staging (_begin_cold_builds).
            self._warmstart_builds(total_iters)
        if self._train_step_fn is not None and getattr(self, "_pending_adapt", None):
            # sliced drivers: a decision fired at the end of the previous
            # train() call; re-attempt its prefetch in case any key was
            # skipped (idempotent — existing keys are not rebuilt)
            self._prefetch_chunk(self._pending_adapt, total_iters)

        def crossed(period: int) -> bool:
            """True when a multiple of `period` lies in (step - last_n, step]."""
            return (self.step // period) > ((self.step - self._last_n) // period)

        last_metrics: Dict[str, float] = {}
        t_start = time.time()
        window_t0, window_steps, window_rays = time.time(), 0, 0

        while self.step < total_iters:
            step = self.step
            # apply a pending (prefetch-compiled) batch adaptation at its
            # scheduled boundary — fixed-step application keeps the
            # trajectory deterministic whether or not the background
            # compile has already landed (the chunk call blocks if not)
            if (
                self._pending_adapt is not None
                and step >= self._pending_adapt["apply_step"]
            ):
                self._apply_adapt(self._pending_adapt)
                self._pending_adapt = None
            # BEFORE_TRAIN_ITERATION: occupancy grid EMA update. Steady-state
            # (partial) updates fuse into the chunk dispatch when enabled;
            # warmup FULL updates always go through the separate dispatch.
            due, full = self.model.occ_update_due(step)
            # Fusion is for the settled steady state only (_fuse_gate_step):
            # during warmup AND while the scheduled adapt ladder is still
            # climbing, (partial) updates stay a separate dispatch so no
            # fused chunk variant of a short-lived shape is ever compiled —
            # an interim ladder rung lives ~100 steps, and its fused variant
            # costs a ~50 s compile plus a ~30-45 s first-dispatch program
            # load to save ~1.2 s of dispatch overhead per 16 steps
            # (measured, docs/PERFORMANCE.md round 5). While an adapt is
            # pending (decided, background-compiling), the chunk variant
            # (fused/unfused) is additionally picked to REUSE an
            # already-compiled executable of the current shape rather than
            # block compiling a variant of a shape about to be retired. The
            # fused and unfused paths draw the same RNG stream at the same
            # step, so the trajectory is unchanged by either choice
            # (_build_train_chunk), and the gate is a fixed step — never a
            # wall-clock-dependent switch.
            fuse = due and not full and step >= self._fuse_gate_step()
            if fuse and self._pending_adapt is not None:
                fuse = self._chunk_key(step, total_iters, fuse=True) in getattr(
                    self, "_chunk_fns", {}
                )
            if due and not fuse:
                self.state["occ"] = self._occ_update(full)(
                    self.state["occ"], self.state["params"], step
                )

            key = self._chunk_key(step, total_iters, fuse)
            n, budget = key[0], key[3]
            if key not in self._chunk_fns:
                self._chunk_fns[key] = _ChunkExec(
                    self._build_train_chunk(
                        n, self._dyn_rays, self._dyn_march, budget,
                        fuse_occ=fuse,
                    ),
                    (self.state, self.train_data, self.train_cam),
                    cfg.fast_compile_effort,
                    cfg.background_full_compile,
                    defer_calls=cfg.full_compile_defer_chunks,
                    tag=f" chunk{key}",
                )
            # Scan-1 bridge (cold start): while the scan-N executable is
            # still backend-compiling, step through the prefetched scan-1
            # executable instead of blocking — scan(1) applied n times IS
            # the scan-n trajectory (same step_fn, same RNG stream in the
            # donated state; parity-tested). ~25% slower per step from
            # dispatch overhead, vs ~40 s of idle wait. The choice of
            # executable is wall-clock dependent; the trajectory is not.
            chunk_exec = self._chunk_fns[key]
            bridge = None
            if n > 1 and not fuse and not chunk_exec.ready():
                b = self._chunk_fns.get((1,) + key[1:])
                if b is not None and b._build_thread is not None:
                    # wait for WHICHEVER executable lands first: the scan-1
                    # bridge backend-compiles in ~10-25 s, the scan-n loop
                    # in ~45-55 s (the while-loop pathology) — a one-shot
                    # check can miss the bridge by seconds and then idle
                    # out the whole difference on the scan-n join
                    while not chunk_exec.ready():
                        if b.ready():
                            bridge = b if b._fast is not None else None
                            break
                        time.sleep(0.25)
                elif b is not None and b.ready() and b._fast is not None:
                    bridge = b
            if bridge is not None:
                for _ in range(n):
                    self.state, metrics = bridge(
                        self.state, self.train_data, self.train_cam
                    )
            else:
                self.state, metrics = chunk_exec(
                    self.state, self.train_data, self.train_cam
                )
            self.step += n
            self._last_n = n
            window_steps += n
            window_rays += n * self._dyn_rays

            # dynamic batch adaptation at scheduled one-shot boundaries
            # (occupancy-marching sampler only; the proposal sampler has a
            # fixed per-ray sample count by construction)
            if (
                cfg.dynamic_batching
                and self.model.config.sampler == "occgrid"
                # one decision in flight at a time: a new decision would
                # orphan the pending shape's background compile and decide
                # from metrics of a shape that is about to be replaced
                and self._pending_adapt is None
            ):
                scheduled = any(
                    self.step - self._last_n < s <= self.step
                    for s in cfg.adapt_steps
                )
                periodic = False
                if (
                    not scheduled
                    and cfg.adapt_every > 0
                    and cfg.adapt_steps
                    and self.step > max(cfg.adapt_steps)
                    and crossed(cfg.adapt_every)
                ):
                    # re-adapt only on real drift: occupancy keeps pruning
                    # long after the scheduled adapts, leaving the compact
                    # budgets oversized (wasted hash gathers/scatters)
                    eval_now = sum(self._eval_stage_metrics(metrics))
                    if eval_now <= 0.0:
                        eval_now = float(metrics["num_samples_per_batch"])
                    mean_now = eval_now / max(self._dyn_rays, 1)
                    sized_for = (
                        self._dyn_budgets[0] / 1.3
                        + sum(self._dyn_budgets[1:]) / 1.6
                    ) / max(self._dyn_rays, 1)
                    periodic = abs(mean_now - sized_for) > cfg.adapt_drift * sized_for
                if scheduled or periodic:
                    new = self._compute_adapt(
                        float(metrics["num_samples_per_batch"]),
                        p99=float(metrics.get("num_occupied_p99", 0.0)),
                        eval_stages=self._eval_stage_metrics(metrics),
                    )
                    if new is not None and cfg.adapt_prefetch_steps > 0:
                        # decide now, apply at a fixed later boundary; the
                        # new shape's executable compiles in the background
                        # while training continues at the current shape
                        new["apply_step"] = self.step + cfg.adapt_prefetch_steps
                        # last scheduled rung (or a post-ladder periodic
                        # re-adapt): this shape persists past the fuse gate,
                        # so its fused variant is prefetched too
                        new["final"] = periodic or (
                            cfg.adapt_steps and self.step >= max(cfg.adapt_steps)
                        )
                        self._pending_adapt = new
                        self._prefetch_chunk(new, total_iters)
                    elif new is not None:
                        self._apply_adapt(new)

            if crossed(cfg.steps_per_log) or self.step == total_iters:
                metrics = {k2: float(v) for k2, v in metrics.items()}
                dt = time.time() - window_t0
                metrics["rays_per_sec"] = window_rays / dt
                metrics["steps_per_sec"] = window_steps / dt
                metrics["rays_per_batch"] = self._dyn_rays
                window_t0, window_steps, window_rays = time.time(), 0, 0
                self.writer.write(self.step, metrics)
                last_metrics = metrics

            # endmember side-channel dump (reference umhs_model.py:571-572)
            if crossed(100) and "endmembers" in self.state["params"]:
                np.save("endmembers.npy", np.asarray(self.state["params"]["endmembers"]))

            if crossed(cfg.steps_per_eval_batch) and self.step < total_iters:
                ev = self.eval_batch()
                self.writer.write(self.step, {f"eval/{k}": v for k, v in ev.items()})

            if crossed(cfg.steps_per_eval_image) and self.step < total_iters:
                # cycle the eval split: step % len is constant whenever
                # steps_per_eval_image is a multiple of the split size
                evi = self.eval_image(
                    (self.step // cfg.steps_per_eval_image)
                    % max(len(self.datamanager.eval_dataset), 1)
                )
                self.writer.write(
                    self.step, {f"eval_image/{k}": v for k, v in evi.items()}
                )

            if crossed(cfg.steps_per_save) or (
                cfg.save_final and self.step == total_iters
            ):
                self.save_checkpoint()

        last_metrics["total_train_time_s"] = time.time() - t_start
        return last_metrics

    def _init_dyn(self) -> None:
        """Initialise the dynamic-shape fields (idempotent)."""
        if self._train_step_fn is not None:
            return
        self._chunk_fns = {}
        self._dyn_rays = self.datamanager.config.train_num_rays_per_batch
        self._dyn_march = self.model.march_config
        # pre-adaptation: no compact truncation (full R*S budget) so the
        # bootstrap phase on a dense grid samples exactly like nerfacc.
        # _dyn_budgets: [whole-batch] unstaged, or one entry per
        # termination stage (len(active_stage_boundaries)+1) once sized
        self._dyn_budgets = [self._dyn_rays * self._dyn_march.num_samples]
        self._pending_adapt = None  # decided-but-not-yet-applied resize
        self._train_step_fn = True  # built lazily per (n, rays, march)

    def _warmstart_builds(self, total_iters: int) -> None:
        """Cold-start overlap: start the builds (trace + fast-tier backend
        compile, each in its own daemon thread) for everything the first
        warmup steps will dispatch — the occupancy updates, a scan-1
        BRIDGE chunk, and the step-0 scan-N chunk. The loop's first uses
        join the threads, so the backend compiles run concurrently in the
        compile service instead of serially blocking the loop.

        Build order matters: traces serialize on _TRACE_LOCK, and whoever
        traces first also pays the one-time tracing-machinery warmup
        (measured 67 s first trace vs 11 s for the same structure traced
        later — round-5 cold log). The occ updates trace first (smallest
        graphs, and the step-0 full update is the first thing dispatched),
        then the scan-1 bridge (backend-compiles in ~10-15 s at the fast
        tier vs ~55 s for the scan-16 loop — the while-loop pathology,
        docs/PERFORMANCE.md round 4), then the scan-N chunk. Until the
        scan-N executable lands, the loop steps through the bridge —
        scan(1) applied N times is the identical trajectory.

        (A round-5 variant started these builds from setup() against
        ShapeDtypeStruct args to overlap the trace with init/staging; on
        this single-CPU host the GIL interleaving with setup's own tracing
        blew the first trace up 67 s -> 334 s — measured negative, see
        docs/PERFORMANCE.md round 5. Builds start at the first train()
        call, strictly after setup.)
        """
        cfg = self.config
        ex_state, ex_data, ex_cam = (
            self.state, self.train_data, self.train_cam
        )
        if self.model.config.sampler == "occgrid":
            self._occ_update(True, prefetch=True)
            # the separate partial dispatch serves thinned warmup updates
            # AND every post-warmup boundary before the fuse gate
            if (
                self.model.occ_config.warmup_full_every > 1
                or not cfg.fuse_occ_update
                or self._fuse_gate_step() > self.model.occ_config.warmup_steps
            ):
                self._occ_update(False, prefetch=True)
        key = self._chunk_key(self.step, total_iters, fuse=False)
        keys = [key]
        if key[0] > 1:
            keys.insert(0, (1,) + key[1:])  # bridge traces/compiles first
        for k in keys:
            if k in self._chunk_fns:
                continue
            self._chunk_fns[k] = _ChunkExec(
                self._build_train_chunk(
                    k[0], k[1], self._dyn_march, k[3], fuse_occ=False,
                ),
                (ex_state, ex_data, ex_cam),
                cfg.fast_compile_effort,
                # the bridge retires as soon as the scan-N executable lands
                # — never pay its default-effort background compile
                cfg.background_full_compile and k[0] > 1,
                defer_calls=cfg.full_compile_defer_chunks,
                prefetch=True,
                tag=f" chunk{k}",
            )

    def _fuse_gate_step(self) -> int:
        """First step from which the occupancy update may fuse into the
        chunk dispatch. Gate = the later of occupancy warmup end and the
        scheduled adapt ladder's completion (last scheduled decision +
        prefetch window, rounded up to the occ interval): every shape that
        exists before the gate is short-lived by schedule, and compiling a
        fused variant of it costs far more (fast-tier compile + program
        load) than the ~1.2 s/16-step separate occ dispatch it saves. A
        fixed-step gate keeps the executable ladder deterministic across
        runs (compile-cache hits) regardless of compile wall time."""
        cfg = self.config
        if not cfg.fuse_occ_update:
            return 1 << 62
        gate = self.model.occ_config.warmup_steps
        # only ladder rungs that can actually fire count (a scheduled adapt
        # at/after max_num_iterations never decides)
        live = [s for s in cfg.adapt_steps if s < cfg.max_num_iterations]
        if (
            cfg.dynamic_batching
            and live
            and self.model.config.sampler == "occgrid"
        ):
            interval = self.model.occ_config.update_interval
            done = max(live) + cfg.adapt_prefetch_steps
            gate = max(gate, -(-done // interval) * interval)
        return gate

    def _chunk_key(self, step: int, total_iters: int, fuse: bool):
        """Cache key of the chunk executable the loop dispatches at `step`
        with the CURRENT dynamic shapes: (scan length, rays, samples/ray,
        stage budget(s), occ-fusion variant)."""
        interval = self.model.occ_config.update_interval
        n = min(interval - (step % interval), total_iters - step)
        budget = (
            tuple(self._dyn_budgets)
            if len(self._dyn_budgets) > 1
            else self._dyn_budgets[0]
        )
        return (n, self._dyn_rays, self._dyn_march.num_samples, budget, fuse)

    @staticmethod
    def _eval_stage_metrics(metrics) -> list:
        """Per-stage field-evaluation counts [s1, s2, ...] from a metrics
        dict (num_eval_s{i}_per_batch keys, in stage order)."""
        out, i = [], 1
        while f"num_eval_s{i}_per_batch" in metrics:
            out.append(float(metrics[f"num_eval_s{i}_per_batch"]))
            i += 1
        return out

    def _adapt_batch(
        self,
        samples_per_batch: float,
        p99: float = 0.0,
        eval_stages: Optional[list] = None,
    ) -> None:
        """Compute a resize from measurements and apply it immediately."""
        new = self._compute_adapt(samples_per_batch, p99, eval_stages)
        if new is not None:
            self._apply_adapt(new)

    def _prefetch_chunk(self, new: dict, total_iters: int) -> None:
        """Pre-build the chunk executable for a decided-but-pending batch
        adaptation, keyed exactly as the train loop will look it up.

        The build (trace + fast-tier backend compile) runs in a daemon
        thread (_ChunkExec prefetch mode) so training continues at the
        current shape meanwhile; the loop's lookup at the apply boundary
        finds the entry already in `_chunk_fns` and its first call joins
        the build thread (a no-op if the compile already landed).

        The ladder is simulated against the GLOBAL schedule
        (max_num_iterations), not just the current train() call's target:
        sliced drivers (bench.py, tests) end every call exactly at a
        decision boundary, where a call-local horizon would make the
        prefetch a silent no-op and every rung application would block on
        a synchronous fast-tier compile (~50 s measured) — the round-4
        cold runs' dominant hidden cost."""
        cfg = self.config
        interval = self.model.occ_config.update_interval
        horizon = max(total_iters, cfg.max_num_iterations)
        # simulate the loop's chunk advance from the current (decision)
        # boundary to the first boundary at/after apply_step — that is the
        # step whose (n, fuse) the lookup key will carry
        step = self.step
        while step < new["apply_step"] and step < horizon:
            step += min(interval - (step % interval), horizon - step)
        if step >= horizon:
            return
        gate = self._fuse_gate_step()
        due, full = self.model.occ_update_due(step)
        fuse = due and not full and step >= gate
        n = min(interval - (step % interval), horizon - step)
        budgets = list(new["budgets"])
        budget = tuple(budgets) if len(budgets) > 1 else budgets[0]
        keys = [(n, new["rays"], new["march"].num_samples, budget, fuse)]
        if not fuse and cfg.fuse_occ_update and new.get("final", False):
            # the shape applies before the fuse gate (unfused) but — being
            # the ladder's last scheduled rung — will outlive it: prefetch
            # its FUSED variant too, or the gate crossing blocks ~50 s
            # compiling it (measured, cold run 4's warmup->steady analogue)
            g = max(gate, step)
            g += (interval - g % interval) % interval
            n_post = min(interval, horizon - g)
            if n_post > 0:
                keys.append(
                    (n_post, new["rays"], new["march"].num_samples, budget, True)
                )
        for key in keys:
            if key in self._chunk_fns:
                continue
            self._chunk_fns[key] = _ChunkExec(
                self._build_train_chunk(
                    key[0], new["rays"], new["march"], budget, fuse_occ=key[4],
                ),
                (self.state, self.train_data, self.train_cam),
                cfg.fast_compile_effort,
                cfg.background_full_compile,
                defer_calls=cfg.full_compile_defer_chunks,
                prefetch=True,
                tag=f" chunk{key} (prefetch)",
            )

    def _apply_adapt(self, new: dict) -> None:
        self._dyn_rays = new["rays"]
        self._dyn_march = new["march"]
        self._dyn_budgets = list(new["budgets"])
        print(
            f"[trainer] dynamic batch: mean eval samples/ray "
            f"{new['mean_eval']:.1f} (marched {new['mean_spr']:.1f}, "
            f"p99 {new['p99']:.0f}) -> rays {new['rays']}, "
            f"samples/ray {new['march'].num_samples}, "
            f"budgets {'/'.join(str(b) for b in new['budgets'])}"
        )

    def _compute_adapt(
        self,
        samples_per_batch: float,
        p99: float = 0.0,
        eval_stages: Optional[list] = None,
    ) -> Optional[dict]:
        """Resize (rays, samples-per-ray, stage budgets) to measurements.

        mean samples/ray after grid convergence is far below the static pad.
        S' is sized from the *tail* of the per-ray occupied-count
        distribution (p99 + headroom): clamping S near the mean forces the
        marcher's strided dt-rescale onto tail rays (silhouettes/grazing),
        measured at ~-8 dB of rendering quality. The measured per-stage
        field-evaluation means size only the compact stage budgets and R'
        (~target_num_samples useful field evaluations per step) — large S
        costs just cheap (R, S) VPU lanes; the field cost is the budgets.

        Returns the new shape dict, or None when it would be a no-op.
        """
        import dataclasses as dc

        cfg = self.config
        mean_spr = max(samples_per_batch / max(self._dyn_rays, 1), 1.0)
        osub = max(self._dyn_march.occ_subsamples, 1)
        s0 = self.model.march_config.num_samples

        def round_up(x, m):
            return int(-(-x // m) * m)

        eval_stages = eval_stages or []
        eval_s1 = eval_stages[0] if eval_stages else 0.0
        tail = 1.25 * p99 if p99 > 0 else 3.0 * mean_spr
        new_s = min(s0, max(2 * osub, round_up(tail, osub)))
        # R sized by EVALUATED samples (staged termination skips invisible
        # tails; marched-but-skipped lanes cost no field work)
        mean_eval = (
            sum(eval_stages) / max(self._dyn_rays, 1)
            if eval_s1 > 0
            else mean_spr
        )
        new_r = int(cfg.target_num_samples / max(mean_eval, 1.0))
        # keep the ray batch divisible by the patch area (patch sampling
        # emits whole patch_size^2 blocks) AND 256-aligned (shard/tile
        # alignment): the lcm covers patch sizes whose square is not a
        # power of two (e.g. 3 -> 9, 6 -> 36), where max(256, p2) produced
        # batches that tripped sample_pixel_batch's divisibility assert
        p2 = max(self.datamanager.config.patch_size, 1) ** 2
        align = math.lcm(256, p2)
        new_r = max(align, min((1 << 17) // align * align, (new_r // align) * align))
        shapes_unchanged = (new_s, new_r) == (
            self._dyn_march.num_samples, self._dyn_rays
        )
        scale_r = new_r / max(self._dyn_rays, 1)
        old_budgets = list(self._dyn_budgets)
        new_march = dc.replace(self._dyn_march, num_samples=new_s)
        # compact stage budgets: ~1.3x the measured stage-1 mean; tail
        # stages get extra headroom (1.6x) — their occupancy is the most
        # variable. One budget per termination stage.
        bounds = self.model.active_stage_boundaries(new_s)
        if eval_s1 > 0 and bounds:
            s1_cap = bounds[0]
            # Physical lane maxima per stage: stage 1 evaluates at most
            # s1_cap depth-ordered lanes per ray, stage i at most its
            # boundary gap. Budgets above these caps are pure padded
            # gather/MLP waste — the FIRST staged adapt sizes budgets[0]
            # from the UNSTAGED eval demand (~mean_spr lanes/ray), which at
            # bench shapes overshot the stage-1 physical max by ~2x
            # (340,480 sized vs 163,840 = R*8 possible — round-5 fix).
            gaps = [bounds[0]] + [
                b - a for a, b in zip(bounds, list(bounds[1:]) + [new_s])
            ]
            phys = [new_r * g for g in gaps]
            budgets = [
                max(4096, min(int(1.3 * eval_s1 * scale_r), phys[0]) // 256 * 256)
            ]
            n_tail = len(bounds)
            # bootstrap estimate for unmeasured tail stages: mean marched
            # excess over the stage-1 lanes, split evenly among them
            est = max(mean_spr - s1_cap, 0.25 * mean_spr) * new_r
            for i in range(1, n_tail + 1):
                measured = eval_stages[i] if i < len(eval_stages) else 0.0
                prev = old_budgets[i] if i < len(old_budgets) else None
                if measured <= 0.0:
                    # demand unmeasured (first staged adapt): bootstrap from
                    # the marched excess, capped at the stage-1 budget. (The
                    # cap used to be a FLOOR — tail buffers bootstrapped to
                    # the full stage-1 size, 6.5x the excess estimate at
                    # bench shapes, which tripled the first adapted chunk's
                    # compile and its per-step cost for the whole interim
                    # window. Undersized bootstraps self-correct below.)
                    budgets.append(
                        max(
                            4096,
                            min(
                                budgets[0],
                                int(1.6 * est / n_tail),
                                phys[i],
                            ) // 256 * 256,
                        )
                    )
                elif prev is not None and measured >= 0.9 * prev:
                    # the prior measurement ran into its own budget ceiling
                    # (truncation hides true demand): escalate — double the
                    # buffer (R-rescaled) instead of re-using an estimate
                    # that already proved too small. Capped at the physical
                    # maximum demand (every lane of every ray occupied):
                    # repeated ceiling hits must not overshoot past what the
                    # march can ever emit
                    budgets.append(
                        max(
                            4096,
                            min(
                                int(2.0 * prev * scale_r),
                                phys[i],
                            ) // 256 * 256,
                        )
                    )
                else:
                    budgets.append(
                        max(
                            4096,
                            min(int(1.6 * measured * scale_r), phys[i])
                            // 256 * 256,
                        )
                    )
        else:
            budgets = [max(4096, int(1.3 * mean_spr * new_r) // 256 * 256)]
        # no-op only when BOTH the shapes and the budgets are unchanged:
        # with rays pinned at the cap the budgets still drift and must be
        # resized, else the periodic drift check re-fires forever
        if shapes_unchanged and budgets == old_budgets:
            return None
        return {
            "rays": new_r,
            "march": new_march,
            "budgets": budgets,
            "mean_eval": mean_eval,
            "mean_spr": mean_spr,
            "p99": p99,
        }

    # ------------------------------------------------------------------
    def eval_batch(self) -> Dict[str, float]:
        """Loss/metrics on a random eval-split ray batch (reference
        get_eval_loss_dict, umhs_pipeline.py:120-135)."""
        dm = self.datamanager
        if not hasattr(self, "_eval_device_data"):
            self._eval_device_data = {
                k: jnp.asarray(v) for k, v in dm.eval_dataset.arrays().items()
            }
            vi = dm.eval_dataset.valid_indices()
            if vi is not None:
                self._eval_device_data["valid_indices"] = jnp.asarray(vi)
            self._eval_cam = dm.eval_outputs.cameras.to_device_dict()
        eval_arrays = self._eval_device_data
        cam = self._eval_cam
        key = jax.random.PRNGKey(self.step)
        k1, k2, k3 = jax.random.split(key, 3)
        rays, batch = sample_pixel_batch(
            eval_arrays, cam, k1, dm.config.eval_num_rays_per_batch,
            camera_type=dm.eval_outputs.cameras.camera_type,
        )
        if self._forward_fn is None:
            self._forward_fn = self._build_forward(train=False)
        outputs = self._forward_fn(self.state, rays, k2)
        metrics = self.model.metrics(outputs, batch)
        loss = self.model.loss(outputs, batch, k3, step=self.step)
        out = {k: float(v) for k, v in {**metrics, **loss}.items()}
        return out

    def render_camera(self, rays: Dict[str, jnp.ndarray], hw: Tuple[int, int],
                      chunk: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Full-image chunked render (reference
        get_outputs_for_camera_ray_bundle, umhs_model.py:593-620)."""
        h, w = hw
        n = h * w
        chunk = chunk or self.model.config.eval_num_rays_per_chunk
        # round the chunk count up to a power of two: every resolution maps
        # onto one of O(log) compiled shapes instead of one shape per
        # resolution (alternating viewer sizes used to recompile every time);
        # padded chunks render dummy rays (<2x waste, dispatch-free)
        num_chunks = 1 << max(0, (-(-n // chunk)) - 1).bit_length() if n > chunk else 1
        pad = num_chunks * chunk - n
        padded = {}
        for k, v in rays.items():
            if pad > 0:
                fill = jnp.zeros((pad, *v.shape[1:]), v.dtype)
                if k == "directions":
                    fill = fill.at[:].set(jnp.array([0.0, 0.0, 1.0], v.dtype))
                v = jnp.concatenate([v, fill])
            padded[k] = v.reshape(num_chunks, chunk, *v.shape[1:])

        # one dispatch for the whole image: lax.map over chunks (a host-side
        # chunk loop pays a tunnel round trip per chunk)
        if getattr(self, "_render_fns", None) is None:
            self._render_fns = {}
        key_rf = (chunk, num_chunks)
        if key_rf not in self._render_fns:
            # ray-sharded under the mesh when the chunk divides the mesh
            # size (it is 256-aligned in production; odd viewer chunk sizes
            # fall back to replicated rendering)
            mesh = self.mesh
            if mesh is not None and chunk % int(mesh.devices.size) != 0:
                mesh = None
            fwd = make_eval_forward(self.model, mesh)

            def render_all(state, chunks):
                key = jax.random.PRNGKey(0)
                return jax.lax.map(
                    lambda sl: fwd(
                        state["params"], state["occ"], sl, key, state["step"]
                    ),
                    chunks,
                )

            # the lax.map over chunks is a while loop -> same XLA compile
            # pathology as the train chunk (docs/PERFORMANCE.md round 4);
            # tier it like the chunk: fast-effort first, full in background
            self._render_fns[key_rf] = _ChunkExec(
                jax.jit(render_all),
                (self.state, padded),
                self.config.fast_compile_effort,
                self.config.background_full_compile,
            )
        outs = self._render_fns[key_rf](self.state, padded)
        merged = {}
        for k, v in outs.items():
            arr = np.asarray(v).reshape(num_chunks * chunk, -1)[:n]
            merged[k] = arr.reshape(h, w, -1)
        return merged

    def eval_image(self, idx: int = 0) -> Dict[str, float]:
        """Full-image eval metrics (reference get_image_metrics_and_images,
        umhs_model.py:407-512): PSNR/SSIM on RGB, spectral PSNR/SSIM/SAM/RMSE."""
        rays, batch, hw = self.datamanager.eval_image(idx)
        outputs = self.render_camera(rays, hw)
        gt_rgb = np.asarray(self.model.blend_background(batch["image"]))
        pred_rgb = outputs["rgb"]
        m = {
            "psnr": metrics_utils.psnr(pred_rgb, gt_rgb),
            "ssim": metrics_utils.ssim(pred_rgb, gt_rgb),
            "rmse": float(np.sqrt(np.mean((pred_rgb - gt_rgb) ** 2))),
        }
        if "spectral" in self.model_config.method and "hs_image" in batch:
            gt_s = np.asarray(batch["hs_image"])
            pred_s = outputs["spectral"]
            m.update(
                {
                    "psnr_spectral": metrics_utils.psnr(pred_s, gt_s),
                    "ssim_spectral": metrics_utils.ssim(pred_s, gt_s),
                    "sam_spectral": metrics_utils.sam(pred_s, gt_s),
                    "rmse_spectral": float(np.sqrt(np.mean((pred_s - gt_s) ** 2))),
                }
            )
            lp = metrics_utils.lpips(pred_rgb, gt_rgb)
            if lp is not None:
                # the plain "lpips" key is reserved for the calibrated
                # (ImageNet-pretrained) metric; the zero-egress random-VGG
                # fallback reports under a variant-scoped key so its values
                # can never be mistaken for reference-comparable LPIPS
                if metrics_utils.LPIPS_VARIANT == "vgg16_imagenet":
                    m["lpips"] = lp
                else:
                    m["lpips_vgg16random"] = lp
            # segmentation PNG dump side-channel (reference writes seg_pred
            # images during eval, umhs_model.py:495-501) — opt-in directory
            # instead of the reference's hard-coded ./eval/ajar_final/.
            if self.config.eval_seg_dump_dir is not None:
                from PIL import Image

                d = Path(self.config.eval_seg_dump_dir)
                (d / "color").mkdir(parents=True, exist_ok=True)
                seg_raw = outputs["seg_raw"][..., 0].astype(np.uint8)
                Image.fromarray(seg_raw).save(d / f"seg_pred_{idx}.png")
                color = (np.clip(outputs["seg_pred"], 0, 1) * 255).astype(np.uint8)
                Image.fromarray(color).save(d / "color" / f"{idx}.png")
        if self.config.save_eval_images:
            self._emit_eval_images(idx, gt_rgb, pred_rgb, outputs)
        return m

    def _emit_eval_images(self, idx: int, gt_rgb, pred_rgb, outputs) -> None:
        """gt|pred side-by-side + turbo depth + turbo accumulation composites,
        sent through the writer (tensorboard/wandb images) and dumped as PNGs
        under run_dir/eval_images/ so long runs are inspectable (reference
        get_image_metrics_and_images, umhs_model.py:407-512)."""
        from PIL import Image

        from ..utils.colormaps import apply_colormap, apply_depth_colormap

        composites = {
            "img": np.concatenate(
                [np.clip(gt_rgb, 0, 1), np.clip(pred_rgb, 0, 1)], axis=1
            ),
            "depth": apply_depth_colormap(
                outputs["depth"], outputs.get("accumulation")
            ),
            "accumulation": apply_colormap(outputs["accumulation"]),
        }
        if "seg_pred" in outputs:
            composites["seg_pred"] = np.clip(outputs["seg_pred"], 0, 1)
        d = self.run_dir / "eval_images"
        d.mkdir(parents=True, exist_ok=True)
        for name, img in composites.items():
            self.writer.write_image(self.step, f"eval_img_{idx}/{name}", img)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                d / f"step-{self.step:09d}-{idx}-{name}.png"
            )

    def eval_all_images(self) -> Dict[str, float]:
        """Average eval-image metrics over the whole eval split (the ns-eval
        'Eval Images Metrics Dict (all images)' equivalent)."""
        n = len(self.datamanager.eval_dataset)
        if n == 0:
            return {}
        sums: Dict[str, float] = {}
        for i in range(n):
            m = self.eval_image(i)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
        return {k: v / n for k, v in sums.items()}

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------
    def save_checkpoint(self, directory: Optional[Path] = None):
        import orbax.checkpoint as ocp

        ckpt_dir = Path(directory) if directory is not None else self.checkpoint_dir
        path = (ckpt_dir / f"step-{self.step:09d}").absolute()
        ckpt = {
            "params": self.state["params"],
            "opt_state": self.state["opt_state"],
            "occ": self.state["occ"],
            # sampling stream rides along: a resume continues the stream
            # instead of replaying the setup seed's batches
            "rng": self.state["rng"],
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, ckpt, force=True)
        # dynamic-batch state rides along so resume keeps the adapted shapes
        if hasattr(self, "_dyn_march"):
            import json as _json

            with open(path / "dynamic_batch.json", "w") as f:
                _json.dump(
                    {
                        "rays": self._dyn_rays,
                        "num_samples": self._dyn_march.num_samples,
                        "budgets": list(self._dyn_budgets),
                    },
                    f,
                )
        if self.config.save_only_latest_checkpoint:
            for p in sorted(ckpt_dir.glob("step-*")):
                if p.name != f"step-{self.step:09d}":
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)

    def load_checkpoint(self, load_dir: Path, load_step: Optional[int] = None):
        import orbax.checkpoint as ocp

        load_dir = Path(load_dir)
        if load_step is None:
            steps = sorted(int(p.name.split("-")[1]) for p in load_dir.glob("step-*"))
            assert steps, f"no checkpoints under {load_dir}"
            load_step = steps[-1]
        path = (load_dir / f"step-{load_step:09d}").absolute()
        template = {
            "params": self.state["params"],
            "opt_state": self.state["opt_state"],
            "occ": self.state["occ"],
            "rng": self.state["rng"],
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(path, template)
            except Exception:
                # legacy checkpoints predate the rng leaf
                template.pop("rng")
                restored = ckptr.restore(path, template)
        self.state.update(restored)
        self.state["step"] = jnp.asarray(load_step, jnp.int32)
        if self.mesh is not None:
            # restored arrays carry file/host shardings; re-replicate so
            # the donated train chunk sees the expected mesh layout
            self.state = put_replicated(self.state, self.mesh)
        self.step = load_step
        dyn_path = path / "dynamic_batch.json"
        if dyn_path.exists():
            import dataclasses as dc
            import json as _json

            with open(dyn_path) as f:
                dyn = _json.load(f)
            # lazily-initialised train() state; pre-seed it so the first
            # chunk after resume compiles with the adapted shapes
            self._chunk_fns = {}
            self._train_step_fn = True
            # the dyn snapshot stores APPLIED shapes; an adapt that was
            # pending (decided, prefetch-compiling) at save time is dropped —
            # the periodic drift check re-derives it after resume
            self._pending_adapt = None
            self._dyn_rays = int(dyn["rays"])
            self._dyn_march = dc.replace(
                self.model.march_config, num_samples=int(dyn["num_samples"])
            )
            if "budgets" in dyn:
                self._dyn_budgets = [int(b) for b in dyn["budgets"]]
            else:  # legacy single/dual-budget checkpoints
                self._dyn_budgets = [int(dyn["budget"])] + (
                    [int(dyn["budget2"])] if dyn.get("budget2") else []
                )
        # endmember dump on load (reference umhs_pipeline.py:175)
        if "endmembers" in self.state["params"]:
            np.save(
                "endmembers_loaded.npy",
                np.asarray(self.state["params"]["endmembers"]),
            )
