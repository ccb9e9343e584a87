"""bf16-compute fidelity bound for the full graph (BASELINE.md "fp32
fidelity" anchor): the serving headline runs bf16 (fp32 params/LN/softmax/
geometry), so the end-to-end divergence vs fp32 must be bounded, not
assumed from per-op pins."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.configs import presets
from veon_tpu.model.veon import VeonModel, fusion_rule
from veon_tpu.nn import text as text_mod

from tests.test_model_graph import _metas


def _outputs(compute_dtype):
    cfg = dataclasses.replace(presets.veon_tiny_test(),
                              compute_dtype=compute_dtype)
    rng = np.random.default_rng(11)
    B, F, N = 1, 1, 6
    H, W = cfg.data.input_size
    imgs = jnp.asarray(rng.standard_normal((B, F, N, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(1.0, 40.0, size=(B, F, N, H // 2, W // 2)).astype(np.float32))
    metas = _metas(B, F, N, rng)
    prompts, refl = text_mod.build_vocabulary()
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    model = VeonModel(cfg=cfg)
    # identical fp32 params for both precisions: init the fp32 graph
    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    model32 = VeonModel(cfg=cfg32)
    params = jax.jit(model32.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=False)
    out = jax.jit(model.apply, static_argnames=("train",))(
        params, imgs, depth, metas, ovw, train=False)
    m = text_mod.merge_matrix(refl)
    merged = text_mod.merge_classes_max(out["sem_occ_raw"], m, axis=-1)
    pred = fusion_rule(merged, out["bin_occ"])
    return out, np.asarray(pred)


def test_bf16_full_graph_divergence_bounded():
    out32, pred32 = _outputs("float32")
    out16, pred16 = _outputs("bfloat16")

    # fusion-rule label flip rate: the eval-visible consequence of bf16
    flips = float((pred32 != pred16).mean())

    # cosine of the CLIP-space voxel embedding field (what retrieval sees)
    a = np.asarray(out32["feat_occ"]).reshape(-1)
    b = np.asarray(out16["feat_occ"]).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # binary-occupancy probability drift
    p32 = jax.nn.softmax(out32["bin_occ"], axis=-1)[..., 0]
    p16 = jax.nn.softmax(out16["bin_occ"], axis=-1)[..., 0]
    occ_mad = float(jnp.abs(p32 - p16).mean())

    print(f"bf16 divergence: flip_rate={flips:.4f} feat_cos={cos:.5f} "
          f"occ_prob_mad={occ_mad:.5f}")
    # bounds = measured-on-CPU values with ~3x headroom (random weights are
    # the WORST case — real trained weights have larger margins at decision
    # boundaries than noise does)
    assert flips < 0.15, flips
    assert cos > 0.98, cos
    assert occ_mad < 0.05, occ_mad
