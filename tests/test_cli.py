"""CLI + TOML config parity (main.cpp parseCli: TOML merged under CLI)."""

import sys

from prosper_tpu.app import cli


def test_parser_defaults():
    args = cli.build_parser().parse_args(["render"])
    assert args.width == 1920 and args.height == 1080  # main.cpp:29
    assert args.mode == "forward"
    assert args.scene.endswith("FlightHelmet.gltf")  # default scene


def test_toml_overrides_defaults(tmp_path, monkeypatch):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text('width = 640\nheight = 360\nmode = "pt"\n')
    argv = ["render", "--config", str(cfg)]
    args = cli.build_parser().parse_args(argv)
    # emulate main()'s merge
    import tomllib

    with open(cfg, "rb") as f:
        toml_cfg = tomllib.load(f)
    for k, v in toml_cfg.items():
        k2 = k.replace("-", "_")
        flag = "--" + k2.replace("_", "-")
        if hasattr(args, k2) and flag not in argv:
            setattr(args, k2, v)
    assert args.width == 640 and args.height == 360 and args.mode == "pt"


def test_cli_wins_over_toml(tmp_path):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text("width = 640\n")
    argv = ["render", "--config", str(cfg), "--width", "320"]
    args = cli.build_parser().parse_args(argv)
    import tomllib

    with open(cfg, "rb") as f:
        toml_cfg = tomllib.load(f)
    for k, v in toml_cfg.items():
        k2 = k.replace("-", "_")
        flag = "--" + k2.replace("_", "-")
        if hasattr(args, k2) and flag not in argv:
            setattr(args, k2, v)
    assert args.width == 320  # CLI wins (main.cpp:46-130 semantics)


def test_draw_type_index():
    assert cli._draw_type_index("default") == 0
    assert cli._draw_type_index("shading_normal") == 6
    assert cli._draw_type_index("metallic") == 10
