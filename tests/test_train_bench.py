"""Training-step benchmark tool smoke (utils/train_bench.py).

The tool chip-times the stage-2 train step per jax.checkpoint policy and
projects the 24-epoch recipe wall-clock (the reference only ever logs
mmcv's per-iter `time`; `README.md:157` pins the 8xV100/24-epoch recipe).
Real-chip numbers live in NOTES.md; this keeps the tool honest on the tiny
preset: policy parsing, compile + memory fields, a finite timed step, and
the recipe projection arithmetic.
"""

import numpy as np


def test_parse_policy_tokens():
    from veon_tpu.utils.train_bench import _parse_policy

    assert _parse_policy("true") is True
    assert _parse_policy("full") is True
    assert _parse_policy("false") is False
    assert _parse_policy("none") is False
    assert _parse_policy(" dots_saveable ") == "dots_saveable"


def test_remat_policy_flag_threads_to_model():
    """`train --remat dots_saveable` must reach VeonModel.remat (train only;
    eval builds always run remat=False)."""
    from veon_tpu.cli.main import _build_model_and_params
    from veon_tpu.configs import presets

    cfg = presets.veon_tiny_test()
    model, *_ = _build_model_and_params(cfg, train=True,
                                        remat_policy="dots_saveable")
    assert model.remat == "dots_saveable"
    model, *_ = _build_model_and_params(cfg, train=True, remat_policy=None)
    assert model.remat is True
    model, *_ = _build_model_and_params(cfg, train=False,
                                        remat_policy="dots_saveable")
    assert model.remat is False


def test_train_bench_tiny_policy_leg():
    from veon_tpu.utils import train_bench as tb

    cfg, batch, variables, membership = tb.build_train_setup(
        "veon_tiny_test", "float32")
    r = tb.measure_policy(cfg, batch, variables, membership,
                          "dots_saveable", steps=1)
    assert "compile_error" not in r and "run_error" not in r, r
    assert r["remat"] == "dots_saveable"
    assert r["ms_per_step"] > 0 and np.isfinite(r["ms_per_step"])
    assert set(r["memory"]) >= {"temp_gb", "arg_gb", "out_gb"} or \
        "error" in r["memory"]
    # 24-epoch projection: ceil(28130/8) * 24 steps at the measured rate
    steps_total = -(-tb.NUSC_TRAIN_SAMPLES // tb.RECIPE_REPLICAS) \
        * tb.RECIPE_EPOCHS
    expect_h = steps_total * (r["ms_per_step"] / 1e3) / 3600.0
    assert abs(r["projected_24ep_8chip_h"] - expect_h) < 0.06
