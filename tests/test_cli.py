"""CLI argument → config mapping."""

from ocean_jax.cli import build_parser, config_from_args
from ocean_jax.config import OCPConfig


def test_cli_roundtrip():
    defaults = OCPConfig(use_line_search=True)
    p = build_parser("x", defaults)
    args = p.parse_args([
        "--ud-experiment", "400_buoys", "--num-steps", "7",
        "--unit-square-resolution", "16", "--viscosity", "0.01",
        "--no-line-search", "--lr", "2.5", "--grad-check", "--fast",
        "--out-dir", "/tmp/x/"])
    cfg = config_from_args(args, defaults)
    assert cfg.K == 400
    assert cfg.num_steps == 7
    assert cfg.unit_square_resolution == 16
    assert cfg.viscosity == 0.01
    assert not cfg.use_line_search
    assert cfg.LR == 2.5
    assert cfg.grad_check
    # --fast bundle = the measured hardware winners (psrc_micro.json:
    # fused+inverse is the fastest K=1e4 cell)
    assert cfg.newton_reuse_lu and cfg.psrc_method == "fused"
    assert cfg.dense_apply == "inverse"
    assert cfg.ode_backend == "pallas"
    assert cfg.alpha_scaled == 400 * 1e-6


def test_cli_defaults_preserved():
    defaults = OCPConfig(ud_experiment="10_buoys", use_line_search=False)
    p = build_parser("x", defaults)
    cfg = config_from_args(p.parse_args([]), defaults)
    assert cfg.ud_experiment == "10_buoys"
    assert not cfg.use_line_search
    assert cfg.psrc_method == "scatter"
    assert cfg.ode_backend == "gather"
