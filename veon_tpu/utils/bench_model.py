"""Per-preset on-chip serving benchmark — bench.py's methodology for ANY
preset (veon_b / veon_l / veon_b_zoe / veon_l_zoe, any num_temporal=1 rig).

The driver-facing bench.py pins the flagship (veon_b); this tool measures
the rest of the config matrix (BASELINE.md ladder item 5: VEON-L) with the
same protocol: fps = n / sum(pure inference time) per
`tools/analysis_tools/benchmark.py:73-96`, robust to the tunneled backend by
running the timed loop on-device (lax.scan over N full forwards with input
perturbation against CSE) and reading back one scalar.

    python -m veon_tpu.utils.bench_model --preset veon_l --iters 8
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Tuple


def build_serving_forward(preset: str = "veon_b", dtype: str = "bfloat16",
                          presorted: bool = True):
    """(fn, args) for the full serving graph of a preset — the generic form
    of `__graft_entry__.entry()` (same graph for preset='veon_b')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..cli.shapes import example_batch_full
    from ..configs import presets
    from ..geometry.frustum import sensor2keyego_chain
    from ..lift.lss import LSSLift
    from ..model.veon import VeonModel, fusion_rule
    from ..nn import text as text_mod

    cfg = getattr(presets, preset)()
    cfg = dataclasses.replace(
        cfg, compute_dtype=dtype,
        depth=dataclasses.replace(cfg.depth, use_lora=False))
    model = VeonModel(cfg=cfg)
    imgs, depth_imgs, metas = example_batch_full(cfg)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(1)
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(model.init, static_argnames=("train", "method"))(
            jax.random.PRNGKey(0), imgs, depth_imgs, metas, ovw, train=False,
            method=VeonModel.full_forward)
    params = jax.device_put(params, jax.devices()[0])
    membership = text_mod.merge_matrix(refl)

    if presorted:
        s2k = sensor2keyego_chain(
            metas["sensor2egos"].reshape(1, -1, 4, 4),
            metas["ego2globals"].reshape(1, -1, 4, 4),
            metas["sensor2egos"].shape[1], metas["sensor2egos"].shape[2])
        lift = LSSLift.from_config(cfg)
        metas = dict(metas)
        metas["lift_sorted"] = lift.precompute_sorted(
            s2k[:, 0], metas["intrins"][:, 0], metas["post_rots"][:, 0],
            metas["post_trans"][:, 0], metas["bda"])

    def forward(params, imgs, depth_imgs, metas, ovw):
        out = model.apply(params, imgs, depth_imgs, metas, ovw, train=False,
                          method=VeonModel.full_forward)
        merged = text_mod.merge_classes_max(out["sem_occ_raw"], membership,
                                            axis=-1)
        return fusion_rule(merged, out["bin_occ"])

    return forward, (params, imgs, depth_imgs, metas, ovw)


def measure(preset: str, dtype: str = "bfloat16", iters: int = 8,
            presorted: bool = True) -> Tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    fn, args = build_serving_forward(preset, dtype, presorted)
    params, imgs, depth_imgs, metas, ovw = args
    eps = jnp.linspace(0.0, 1e-3, iters)

    @jax.jit
    def many(params, imgs, depth_imgs, metas, ovw):
        def body(c, e):
            out = fn(params, imgs + e, depth_imgs + e, metas, ovw)
            return c + out.sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), eps)
        return c

    t0 = time.perf_counter()
    float(many(params, imgs, depth_imgs, metas, ovw))
    first_call_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(params, imgs, depth_imgs, metas, ovw))
        times.append(time.perf_counter() - t0)
    per = sorted(times)[1] / iters
    # the first call blocks on compile PLUS one full timed loop — subtract
    # the loop so compile_s reports the actual compilation cost
    compile_s = max(0.0, first_call_s - per * iters)
    return 1.0 / per, {"ms_per_frame": round(per * 1e3, 2),
                       "compile_s": round(compile_s, 1),
                       "iters": iters, "dtype": dtype,
                       "presorted": presorted}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="veon_b")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-presorted", action="store_true",
                    help="use the banded (training-formulation) lift")
    args = ap.parse_args()
    fps, detail = measure(args.preset, args.dtype, args.iters,
                          presorted=not args.no_presorted)
    print(json.dumps({
        "metric": f"{args.preset}_6cam_frames_per_sec_per_chip",
        "value": round(fps, 3), "unit": "frames/s", "detail": detail,
    }))


if __name__ == "__main__":
    main()
