"""Eval-loop benchmark tool smoke (utils/eval_bench.py).

The tool chip-times `veon_tpu test`'s protocol (the `tools/test.py:247-266`
inference loop + `occ_metrics.py:121-147` hist): per-frame H2D + forward +
uint8 grid readback, the real-loader e2e leg, and the post-loop hist cost.
The real-chip numbers live in NOTES.md; this test keeps the tool itself
honest on the tiny fixture (all three legs finite, one JSON line printed,
CLI dispatch wired).
"""

import dataclasses
import json

import numpy as np


def _fixture_preset(monkeypatch):
    from veon_tpu.configs import presets

    def veon_tiny_fixture(num_temporal=1):
        cfg = presets.veon_tiny_test(num_temporal=num_temporal)
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, src_size=(90, 160)))

    monkeypatch.setattr(presets, "veon_tiny_fixture", veon_tiny_fixture,
                        raising=False)


def test_eval_bench_tiny_all_legs(monkeypatch, tmp_path, capsys):
    _fixture_preset(monkeypatch)
    from veon_tpu.utils import eval_bench

    out = eval_bench.run(n_frames=2, preset="veon_tiny_fixture",
                         workers=1, keep=str(tmp_path))
    d = out["detail"]
    assert out["unit"] == "frames/s"
    assert np.isfinite(out["value"]) and out["value"] > 0
    assert d["device_path_ms_per_frame"] > 0
    assert d["pipelined_fps"] > 0
    assert d["e2e_fps"] > 0
    assert "inference done" in d["e2e_inference_line"]
    assert d["hist_ms_per_frame"] > 0
    assert np.isfinite(d["miou"])
    # driver contract: the last stdout line is one parseable JSON record
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["metric"] == out["metric"]


def test_evaluate_occ_pipeline_order_parity():
    """The overlapped eval loop (pipeline>1) must hand dataset.evaluate the
    same grids in the same loader order as the strictly serial protocol."""
    import jax.numpy as jnp

    from veon_tpu.train.loop import evaluate_occ

    class _DS:
        def evaluate(self, results):
            return {"order": [int(r.reshape(-1)[0]) for r in results],
                    "n": len(results)}

    class _Loader:
        dataset = _DS()

        def __iter__(self):
            for i in range(5):
                yield {"imgs": np.full((1, 2, 2), i, np.float32),
                       "depth_imgs": np.zeros((1, 2, 2), np.float32),
                       "metas": {}, "token": [f"t{i}"]}

    def predict(imgs, depth, metas, ovw):
        return jnp.asarray(imgs, jnp.int32)

    lines = []
    serial = evaluate_occ(predict, _Loader(), None, log_fn=lines.append,
                          pipeline=1)
    piped = evaluate_occ(predict, _Loader(), None, log_fn=lines.append,
                         pipeline=3)
    assert serial == piped == {"order": [0, 1, 2, 3, 4], "n": 5}
    assert all("5 samples" in ln for ln in lines)


def test_benchmark_eval_cli_dispatch(monkeypatch):
    """`veon_tpu benchmark --eval` routes to eval_bench.run with the parsed
    knobs (no model build here — dispatch contract only)."""
    from veon_tpu.cli import main as cli
    from veon_tpu.utils import eval_bench

    calls = {}

    def fake_run(n_frames, preset, dtype, workers, raw_uint8, pipeline):
        calls.update(n_frames=n_frames, preset=preset, dtype=dtype,
                     workers=workers, raw_uint8=raw_uint8, pipeline=pipeline)
        return {}

    monkeypatch.setattr(eval_bench, "run", fake_run)
    cli.main(["benchmark", "--eval", "--frames", "3",
              "--preset", "veon_tiny_test", "--workers", "1", "--raw-uint8",
              "--pipeline", "2"])
    assert calls == dict(n_frames=3, preset="veon_tiny_test",
                         dtype="bfloat16", workers=1, raw_uint8=True,
                         pipeline=2)
