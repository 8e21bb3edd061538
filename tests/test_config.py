import pytest

from audiodepth_tpu.configs import (
    apply_overrides,
    experiment_name,
    load_config,
)


def test_presets_compose():
    cfg = load_config("batvisionv2", "train", "exp1", "unet_baseline")
    assert cfg.dataset.max_depth == 30.0
    assert cfg.dataset.audio_format == "mel_spectrogram"
    assert cfg.dataset.depth_norm is False
    assert cfg.mode.batch_size == 256
    assert cfg.mode.criterion == "Combined"
    assert cfg.model.generator == "unet_256"

    cfg1 = load_config("batvisionv1", "test", "e", "unet_baseline")
    assert cfg1.dataset.depth_norm is True
    assert cfg1.dataset.max_depth == 12.0
    assert cfg1.mode.batch_size == 1
    assert cfg1.mode.criterion == "L1"


def test_overrides_and_coercion():
    cfg = load_config(overrides={"mode.learning_rate": "0.001", "mode.batch_size": "64",
                                 "dataset.depth_norm": "true"})
    assert cfg.mode.learning_rate == 0.001
    assert cfg.mode.batch_size == 64
    assert cfg.dataset.depth_norm is True


def test_null_sentinel_and_extra_overrides():
    from audiodepth_tpu.configs import NULL

    # plain None is skipped (argparse "flag not given")
    cfg = load_config(overrides={"mode.checkpoints": None})
    assert cfg.mode.checkpoints is None
    cfg = apply_overrides(cfg, {"mode.checkpoints": 5})
    assert cfg.mode.checkpoints == 5
    cfg = apply_overrides(cfg, {"mode.checkpoints": None})  # skipped
    assert cfg.mode.checkpoints == 5
    # NULL explicitly clears the field
    cfg = apply_overrides(cfg, {"mode.checkpoints": NULL})
    assert cfg.mode.checkpoints is None
    # model.extra.* subkeys merge into the open dict, NULL → real None
    cfg = apply_overrides(cfg, {"model.extra.remat": False,
                                "model.extra.recon": NULL})
    assert cfg.model.extra["remat"] is False
    assert cfg.model.extra["recon"] is None


def test_cli_override_null_spelling():
    """`--override KEY=null` must actually clear the field (it used to be
    silently dropped by apply_overrides' None skip)."""
    from audiodepth_tpu.cli.train import _parse_override
    from audiodepth_tpu.configs import NULL

    key, value = _parse_override("mode.checkpoints=null")
    assert key == "mode.checkpoints" and value is NULL
    cfg = load_config(overrides={"mode.checkpoints": 7})
    cfg = apply_overrides(cfg, {key: value})
    assert cfg.mode.checkpoints is None


def test_lr_guard():
    with pytest.raises(ValueError):
        load_config(overrides={"mode.learning_rate": 0.5})


def test_mel_on_bv1_rejected():
    with pytest.raises(ValueError):
        load_config("batvisionv1", overrides={"dataset.audio_format": "mel_spectrogram"})


def test_unknown_override_field():
    cfg = load_config()
    with pytest.raises(KeyError):
        apply_overrides(cfg, {"mode.not_a_field": 1})


def test_experiment_name():
    cfg = load_config("batvisionv2", "train", "sweep7", "unet_baseline")
    name = experiment_name(cfg)
    assert name.startswith("unet_256_batvisionv2_BS256_Lr0.002_AdamW")
    assert name.endswith("sweep7")


def test_yaml_dir_override(tmp_path):
    d = tmp_path / "dataset"
    d.mkdir()
    (d / "batvisionv2.yaml").write_text("max_depth: 15.0\ncustom_key: 3\n")
    cfg = load_config("batvisionv2", conf_dir=str(tmp_path))
    assert cfg.dataset.max_depth == 15.0


def test_repo_conf_tree_loads():
    """The in-repo conf/ YAML tree (reference conf/ mirror) composes."""
    import os

    conf = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "conf")
    cfg = load_config("batvisionv1", "test", "e", "unet_baseline", conf_dir=conf)
    assert cfg.dataset.max_depth == 12.0
    assert cfg.mode.batch_size == 1
    cfg2 = load_config("batvisionv2", "train", "e", "binaural_attention", conf_dir=conf)
    assert cfg2.model.attention_levels == (2, 3, 4, 5)
