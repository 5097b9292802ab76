"""Config system tests: dotted flags, aliases, config.yml round trip."""

from pathlib import Path

import pytest

from umhs_tpu.configs import (
    FullConfig,
    apply_cli_overrides,
    load_config,
    save_config,
    umhs_method_defaults,
)


def test_defaults_match_reference():
    cfg = umhs_method_defaults()
    assert cfg.trainer.max_num_iterations == 30000
    assert cfg.trainer.steps_per_save == 2000
    assert cfg.trainer.optimizer.lr == 2e-2
    assert cfg.trainer.optimizer.eps == 1e-15
    assert cfg.pipeline.datamanager.train_num_rays_per_batch == 9216 * 4
    assert cfg.pipeline.datamanager.eval_num_rays_per_batch == 4096
    assert cfg.pipeline.model.alpha_thre == 0.01
    assert cfg.pipeline.model.cone_angle == 0.004
    assert cfg.pipeline.model.grid_resolution == 128
    assert cfg.pipeline.model.grid_levels == 4
    assert cfg.pipeline.model.log2_hashmap_size == 19
    assert cfg.pipeline.model.max_res == 2048


def test_reference_script_flags_parse():
    """The exact flag spellings from scripts/hotdog.sh must parse."""
    argv = [
        "--steps_per_save", "1000",
        "--save_only_latest_checkpoint", "False",
        "--machine.seed", "42",
        "--log-gradients", "True",
        "--pipeline.num_classes", "6",
        "--pipeline.model.far-plane", "1000",
        "--pipeline.model.near_plane", "0.05",
        "--pipeline.model.background-color", "random",
        "--pipeline.model.spectral_loss_weight", "5.0",
        "--pipeline.model.temperature", "0.4",
        "--pipeline.model.pred_dino", "False",
        "--pipeline.model.pred_specular", "True",
        "--pipeline.model.load_vca", "True",
        "--pipeline.model.implementation", "tcnn",
        "--pipeline.datamanager.images-on-gpu", "True",
        "--pipeline.datamanager.patch-size", "1",
        "--pipeline.datamanager.train-num-rays-per-batch", "4096",
        "--pipeline.model.method", "rgb+spectral",
        "--data", "data/processed/hotdog",
        "--experiment-name", "hotdog-t0.4-k6-specular",
        "--vis", "console",
    ]
    cfg, ignored = apply_cli_overrides(umhs_method_defaults(), argv)
    assert cfg.pipeline.num_classes == 6
    assert cfg.pipeline.model.far_plane == 1000
    assert cfg.pipeline.model.temperature == 0.4
    assert cfg.pipeline.model.pred_specular is True
    assert cfg.pipeline.model.method == "rgb+spectral"
    assert cfg.pipeline.model.spectral_loss_weight == 5.0
    assert cfg.pipeline.datamanager.train_num_rays_per_batch == 4096
    assert cfg.pipeline.datamanager.dataparser.data == Path("data/processed/hotdog")
    assert cfg.trainer.experiment_name == "hotdog-t0.4-k6-specular"
    assert cfg.trainer.seed == 42
    assert "pipeline.model.implementation" in ignored
    assert "pipeline.datamanager.images_on_gpu" in ignored


def test_unknown_flag_raises():
    with pytest.raises(KeyError):
        apply_cli_overrides(umhs_method_defaults(), ["--pipeline.model.nope", "1"])


def test_equals_syntax():
    cfg, _ = apply_cli_overrides(
        umhs_method_defaults(), ["--pipeline.model.temperature=0.7"]
    )
    assert cfg.pipeline.model.temperature == 0.7


def test_optional_fields():
    cfg, _ = apply_cli_overrides(
        umhs_method_defaults(),
        ["--pipeline.model.render-step-size", "0.01",
         "--pipeline.datamanager.dataparser.downscale-factor", "2"],
    )
    assert cfg.pipeline.model.render_step_size == 0.01
    assert cfg.pipeline.datamanager.dataparser.downscale_factor == 2


def test_config_yaml_roundtrip(tmp_path):
    cfg, _ = apply_cli_overrides(
        umhs_method_defaults(),
        ["--pipeline.model.method", "spectral",
         "--pipeline.num_classes", "7",
         "--data", "some/dir",
         "--max-num-iterations", "123"],
    )
    save_config(cfg, tmp_path / "config.yml")
    loaded = load_config(tmp_path / "config.yml")
    assert loaded == cfg
    assert isinstance(loaded.pipeline.datamanager.dataparser.data, Path)


def test_tuple_fields_parse():
    """Tuple-typed fields accept comma- or space-separated CLI values and
    survive the yaml round trip."""
    cfg, _ = apply_cli_overrides(
        umhs_method_defaults(),
        ["--pipeline.model.stage-boundaries", "8,16",
         "--trainer.adapt-steps", "256 368 512"],
    )
    assert cfg.pipeline.model.stage_boundaries == (8, 16)
    assert cfg.trainer.adapt_steps == (256, 368, 512)
