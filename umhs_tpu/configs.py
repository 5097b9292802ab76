"""Config tree + dotted-flag CLI parsing + config.yml round trip.

The reference exposes its entire dataclass config tree as tyro CLI flags
(`--pipeline.model.temperature 0.4`, `--pipeline.datamanager.train-num-rays-
per-batch 4096` — /root/reference/scripts/*.sh) and serialises the resolved
config to config.yml for ns-eval/ns-render reload (SURVEY.md §5 Config).
This module reproduces that surface over the TPU config dataclasses:

    FullConfig
    ├── trainer: TrainerConfig  (machine.seed, steps_per_save, vis, ...)
    ├── pipeline.num_classes
    ├── pipeline.model: ModelConfig
    └── pipeline.datamanager: DataManagerConfig
        └── dataparser: DataParserConfig

Flag spelling is tyro-compatible: dashes and underscores are interchangeable
(`--pipeline.model.far-plane` == `--pipeline.model.far_plane`), booleans are
parsed from True/False words, and unknown flags raise with the list of valid
names. A handful of reference flags that have no TPU equivalent
(`--machine.num-devices`, `--viewer.websocket-port`, `--pipeline.model.
implementation`, `--pipeline.datamanager.images-on-gpu`) are accepted and
recorded but do not change behaviour — the mesh always uses every chip, and
there is only one (XLA) implementation.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml

from .data.datamanager import DataManagerConfig
from .data.dataparser import DataParserConfig
from .engine.trainer import OptimizerConfig, TrainerConfig
from .models.model import ModelConfig


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    num_classes: int = 5
    check_nan: bool = False
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    datamanager: DataManagerConfig = dataclasses.field(
        default_factory=DataManagerConfig
    )


@dataclasses.dataclass(frozen=True)
class FullConfig:
    method_name: str = "umhsnerf"
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)


# reference default method config (umhs_config.py:35-67)
def umhs_method_defaults() -> FullConfig:
    return FullConfig(
        trainer=TrainerConfig(
            max_num_iterations=30000,
            steps_per_save=2000,
            steps_per_eval_batch=500,
            mixed_precision=True,
            save_only_latest_checkpoint=False,
            optimizer=OptimizerConfig(lr=2e-2, eps=1e-15, lr_final=1e-5, max_steps=30000),
        ),
        pipeline=PipelineConfig(
            model=ModelConfig(eval_num_rays_per_chunk=4096),
            datamanager=DataManagerConfig(
                train_num_rays_per_batch=9216 * 4,
                eval_num_rays_per_batch=4096,
            ),
        ),
    )


# ---------------------------------------------------------------------------
# dotted flag parsing
# ---------------------------------------------------------------------------

# reference flag -> config path aliases (tyro spellings kept working)
_ALIASES = {
    "data": "pipeline.datamanager.dataparser.data",
    "experiment_name": "trainer.experiment_name",
    "output_dir": "trainer.output_dir",
    "vis": "trainer.vis",
    "machine.seed": "trainer.seed",
    "max_num_iterations": "trainer.max_num_iterations",
    "steps_per_save": "trainer.steps_per_save",
    "steps_per_eval_batch": "trainer.steps_per_eval_batch",
    "steps_per_eval_image": "trainer.steps_per_eval_image",
    "steps_per_log": "trainer.steps_per_log",
    "save_only_latest_checkpoint": "trainer.save_only_latest_checkpoint",
    "mixed_precision": "trainer.mixed_precision",
    "gradient_accumulation_steps": "trainer.gradient_accumulation_steps",
    "log_gradients": "trainer.log_gradients",
    "load_dir": "trainer.load_dir",
    "load_step": "trainer.load_step",
    "optimizers.fields.optimizer.lr": "trainer.optimizer.lr",
    "optimizers.fields.optimizer.eps": "trainer.optimizer.eps",
    "optimizers.fields.scheduler.lr_final": "trainer.optimizer.lr_final",
    "optimizers.fields.scheduler.max_steps": "trainer.optimizer.max_steps",
    "pipeline.datamanager.dataparser.num_classes": "pipeline.num_classes",
}

# accepted-but-inert reference flags
_IGNORED = {
    "machine.num_devices",
    "machine.num_machines",
    "viewer.websocket_port",
    "viewer.num_rays_per_chunk",
    "pipeline.model.implementation",
    "pipeline.datamanager.images_on_gpu",
    "pipeline.datamanager.images_on_device",  # retired: always on-device
    "logging.local_writer.enable",
}


def _canon(flag: str) -> str:
    return flag.lstrip("-").replace("-", "_")


def _field_map(cls) -> Dict[str, dataclasses.Field]:
    return {f.name: f for f in dataclasses.fields(cls)}


def _parse_value(raw: str, typ: Any):
    from typing import get_args, get_origin

    if get_origin(typ) is not None and type(None) in get_args(typ):  # Optional[...]
        if raw.lower() in ("none", "null"):
            return None
        inner = [a for a in get_args(typ) if a is not type(None)][0]
        return _parse_value(raw, inner)
    if typ is bool:
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
        raise ValueError(f"expected bool, got {raw!r}")
    if get_origin(typ) in (tuple, list):
        # tuple/list fields (adapt_steps, stage_boundaries, ...) accept
        # comma- or space-separated values: --x 8,16 or --x "8 16"
        args = [a for a in get_args(typ) if a is not Ellipsis]
        inner = args[0] if args else str
        vals = [
            _parse_value(p, inner)
            for p in raw.replace(",", " ").split()
            if p
        ]
        return tuple(vals) if get_origin(typ) is tuple else vals
    if typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    if typ is Path or typ == "Path":
        return Path(raw)
    return raw  # str and Literal-ish


def _set_path(cfg, dotted: str, raw: str):
    """Immutable set of cfg.<dotted> = parsed(raw); returns a new config."""
    head, _, rest = dotted.partition(".")
    fields = _field_map(type(cfg))
    if head not in fields:
        raise KeyError(
            f"unknown config field '{head}' on {type(cfg).__name__}; "
            f"valid: {sorted(fields)}"
        )
    if rest:
        sub = getattr(cfg, head)
        new_sub = _set_path(sub, rest, raw)
        return dataclasses.replace(cfg, **{head: new_sub})
    import typing

    try:
        typ = typing.get_type_hints(type(cfg))[head]
    except Exception:
        cur = getattr(cfg, head)
        typ = type(cur) if cur is not None else str
    value = _parse_value(raw, typ)
    return dataclasses.replace(cfg, **{head: value})


def apply_cli_overrides(
    config: FullConfig, argv: List[str]
) -> Tuple[FullConfig, Dict[str, str]]:
    """Apply --dotted.flag value pairs; returns (config, ignored_flags)."""
    ignored: Dict[str, str] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"expected --flag, got {arg!r}")
        if "=" in arg:
            flag, raw = arg.split("=", 1)
            i += 1
        else:
            flag = arg
            if i + 1 >= len(argv):
                raise ValueError(f"flag {flag} missing a value")
            raw = argv[i + 1]
            i += 2
        key = _canon(flag)
        key = _ALIASES.get(key, key)
        if key in _IGNORED:
            ignored[key] = raw
            continue
        config = _set_path(config, key, raw)
    return config, ignored


# ---------------------------------------------------------------------------
# config.yml round trip
# ---------------------------------------------------------------------------


def _to_plain(obj):
    if dataclasses.is_dataclass(obj):
        return {
            "__dataclass__": type(obj).__name__,
            **{
                f.name: _to_plain(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, Path):
        return {"__path__": str(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(x) for x in obj]
    return obj


_DATACLASSES = {}


def _register_all():
    from .ops.encodings import HashEncodingConfig

    for cls in (
        FullConfig,
        PipelineConfig,
        TrainerConfig,
        OptimizerConfig,
        ModelConfig,
        DataManagerConfig,
        DataParserConfig,
        HashEncodingConfig,
    ):
        _DATACLASSES[cls.__name__] = cls


def _from_plain(obj):
    if isinstance(obj, dict):
        if "__path__" in obj:
            return Path(obj["__path__"])
        if "__dataclass__" in obj:
            if not _DATACLASSES:
                _register_all()
            cls = _DATACLASSES[obj["__dataclass__"]]
            known = {f.name for f in dataclasses.fields(cls)}
            # tolerate fields that existed when the yml was written but have
            # since been retired (e.g. images_on_device)
            kwargs = {
                k: _from_plain(v)
                for k, v in obj.items()
                if k != "__dataclass__" and k in known
            }
            # tuple-typed fields round-trip as lists
            for f in dataclasses.fields(cls):
                if isinstance(kwargs.get(f.name), list):
                    kwargs[f.name] = tuple(kwargs[f.name])
            return cls(**kwargs)
        return {k: _from_plain(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_from_plain(x) for x in obj]
    return obj


def save_config(config: FullConfig, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(config), f, sort_keys=False)


def load_config(path: Path) -> FullConfig:
    with open(path) as f:
        return _from_plain(yaml.safe_load(f))
