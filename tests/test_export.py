"""jax.export round-trip on a small jitted function (deployment export)."""

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.utils.export import export_inference, load_inference


def test_export_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w).sum(axis=-1)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 3)).astype(np.float32))
    p = export_inference(fn, (x, w), str(tmp_path / "fn.stablehlo"))
    loaded = load_inference(p)
    np.testing.assert_allclose(np.asarray(loaded(x, w)), np.asarray(fn(x, w)), rtol=1e-6)


def test_export_streaming_roundtrip(tmp_path):
    """The streaming temporal serving step exports and reloads: the loaded
    artifact (no model code) must reproduce the live session's first-call
    outputs on the same inputs, and return the cacheable early_vox whose
    shape matches the prev_vox slot it feeds next call."""
    from veon_tpu.utils.export import export_streaming

    path, example = export_streaming(
        str(tmp_path / "t2.stablehlo"), preset="veon_tiny_test",
        num_temporal=2)
    loaded = load_inference(path)
    out = loaded(*example)
    variables, imgs, depth_imgs, m1, ovw, prev_vox, prev_l2g, te = example
    assert out["pred"].dtype in (np.int32, jnp.int32)
    # early_vox must slot back into prev_vox[:, 0] for the next call
    assert out["early_vox"].shape == tuple(prev_vox.shape[:1]) + tuple(
        prev_vox.shape[2:])
    # live (unexported) step on the same inputs agrees
    from veon_tpu.configs import presets
    from veon_tpu.model.veon import VeonModel
    from veon_tpu.nn import text as text_mod
    from veon_tpu.serve.streaming import TemporalSession

    cfg = presets.veon_tiny_test(num_temporal=2)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, depth=dataclasses.replace(cfg.depth, use_lora=False))
    model = VeonModel(cfg=cfg)
    _prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    sess = TemporalSession(model, variables, ovw,
                           membership=text_mod.merge_matrix(refl), jit=False)
    live = sess._fn(variables, imgs, depth_imgs, m1, ovw, prev_vox,
                    prev_l2g, te)
    for k in live:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(live[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
