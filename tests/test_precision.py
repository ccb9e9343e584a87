"""bf16-compute fidelity bound for the full graph (BASELINE.md "fp32
fidelity" anchor): the serving headline runs bf16 (fp32 params/LN/softmax/
geometry), so the end-to-end divergence vs fp32 must be bounded, not
assumed from per-op pins."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.model.veon import VeonModel, fusion_rule
from veon_tpu.nn import text as text_mod


def _pred(out, refl):
    m = text_mod.merge_matrix(refl)
    merged = text_mod.merge_classes_max(out["sem_occ_raw"], m, axis=-1)
    return np.asarray(fusion_rule(merged, out["bin_occ"]))


def test_bf16_full_graph_divergence_bounded(tiny_graph):
    # fp32 reference pass: the session-shared tiny graph (fp32 params + fp32
    # compute); bf16 pass re-applies the SAME params/inputs with a bf16-
    # compute model, so the only difference is compute precision
    g = tiny_graph(1)
    out32, pred32 = g["out"], _pred(g["out"], g["refl"])
    cfg16 = dataclasses.replace(g["cfg"], compute_dtype="bfloat16")
    model16 = VeonModel(cfg=cfg16)
    out16 = jax.jit(model16.apply, static_argnames=("train",))(
        g["params"], g["imgs"], g["depth"], g["metas"], g["ovw"], train=False)
    pred16 = _pred(out16, g["refl"])

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
    # bounds = measured-on-CPU values with ~3x headroom. Random weights are
    # the WORST case — MEASURED in round 4, no longer just argued: on
    # overfit (structured) weights the same battery reads flip 0.0031-0.0094,
    # cos 0.9998, mad 0.0002-0.0006 (tests/test_overfit.py asserts those at
    # ~10x headroom; NOTES round 4 has the numbers), 16-48x inside these
    # random-init bounds.
    assert flips < 0.15, flips
    assert cos > 0.98, cos
    assert occ_mad < 0.05, occ_mad
