from pathlib import Path

import pytest

from mega_nerf_tpu.opts import get_opts_base, parse_opts


def test_defaults_match_reference():
    hp = parse_opts(get_opts_base(), [])
    assert hp.batch_size == 1024
    assert hp.coarse_samples == 256 and hp.fine_samples == 512
    assert hp.lr == 5e-4 and hp.lr_decay_factor == 0.1
    assert hp.train_iterations == 500000
    assert hp.bg_nerf is True and hp.ellipse_bounds is True
    assert hp.center_pixels is True and hp.shifted_softplus is True
    assert hp.appearance_dim == 48 and hp.layer_dim == 256
    assert hp.skip_layers == [4] and hp.boundary_margin == 1.15


def test_yaml_config_layering(tmp_path: Path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("ray_altitude_range: [11, 38]\nlayer_dim: 2048\nno_bg_nerf: true\n")
    hp = parse_opts(get_opts_base(), ["--config_file", str(cfg)])
    assert hp.ray_altitude_range == [11, 38]
    assert hp.layer_dim == 2048
    assert hp.bg_nerf is False  # negated store_false flag via config


def test_cli_overrides_config(tmp_path: Path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("layer_dim: 2048\n")
    hp = parse_opts(get_opts_base(), ["--config_file", str(cfg), "--layer_dim", "64"])
    assert hp.layer_dim == 64


def test_unknown_config_key_raises(tmp_path: Path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("not_a_flag: 1\n")
    with pytest.raises(ValueError, match="not_a_flag"):
        parse_opts(get_opts_base(), ["--config_file", str(cfg)])


def test_repo_config_files_parse():
    repo = Path(__file__).parent.parent
    configs = sorted(repo.glob("configs/*/*.yaml"))
    assert len(configs) >= 42
    for cfg in configs:
        hp = parse_opts(get_opts_base(), ["--config_file", str(cfg)])
        assert hp is not None
    # Spot-check one family's semantics.
    hp = parse_opts(
        get_opts_base(),
        ["--config_file", str(repo / "configs" / "nerf" / "rubble.yaml")],
    )
    assert hp.bg_nerf is False and hp.use_cascade and hp.layer_dim == 2048
    assert hp.appearance_dim == 0
