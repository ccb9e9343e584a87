"""Weights-day activation-parity harness plumbing (round-3 verdict missing
#1 mitigation): the JAX-side comparator must run green on a synthetic dump
that follows dump_reference.py's documented format/layouts, and turn red
when a boundary is corrupted.

The synthetic dump is produced FROM the tiny jax graph with the inverse
layout adapters (torch NCHW / channel-first-3D / dense-hsa-bias), so this
certifies the dump format, key scheme, layout adapters, tolerance plumbing,
and CLI exit semantics — real cross-framework numerics can only be checked
when the released checkpoints exist (the dump half runs in the torch env).
"""

import json

import numpy as np
import pytest

from veon_tpu.parity.compare import (BOUNDARIES, compare_dumps,
                                     format_report, run_jax_boundaries)


def _torchify(name, arr):
    """Inverse of compare.reference_boundaries' adapters: jax layout ->
    the torch-layout npz entries dump_reference.py would have written."""
    a = np.asarray(arr)
    if name.startswith("clip_tokens."):
        sub = name.split(".", 1)[1]
        if sub.endswith("_cls"):  # (BN,1,C) -> (1,BN,C)
            return {f"clip_tokens#0/{sub[:-4]}_cls_token": a.transpose(1, 0, 2)}
        return {f"clip_tokens#0/{sub}": a.transpose(0, 3, 1, 2)}
    if name == "sa_mask_preds":
        return {"side_adapter#0/0/0": a}
    if name == "sa_attn_bias":
        return {"side_adapter#0/1/0": a}
    if name == "rec_mask_embs":
        return {"rec_mask_embs#0": a}
    if name == "rec_update_proj":  # (BN,h,w,C) -> (BN,C,h,w)
        return {"rec_update#0/clip_feat_proj": a.transpose(0, 3, 1, 2)}
    if name == "hsa_attn_dense":  # (A,B,heads,L,L) -> per-layer entries
        return {f"hsa#0/1/{i}": a[i] for i in range(a.shape[0])}
    if name == "hsa_supp":  # (B,Hs,Ws,C) -> (B,C,Hs,Ws)
        return {"hsa#0/2/0": a.transpose(0, 3, 1, 2)}
    if name == "lift_vox":  # (B,Z,Y,X,C) -> (B,C,Z,Y,X)
        return {"lift#0": a.transpose(0, 4, 1, 2, 3)}
    if name in ("occ_bin", "occ_feat"):
        key = "bin_occ" if name == "occ_bin" else "feat_occ"
        return {f"occ_heads#0/{key}": a.transpose(0, 4, 1, 2, 3)}
    if name in ("out_sem_seg_ds", "out_sem_embed_ds", "out_clip_feat"):
        # (B,N,h,w,C) -> (B,N,C,h,w)
        return {f"outputs#0/{name[4:]}": a.transpose(0, 1, 4, 2, 3)}
    if name in ("out_bin_occ", "out_feat_occ"):
        return {f"outputs#0/{name[4:]}": a.transpose(0, 4, 1, 2, 3)}
    return {}  # jax-only boundaries (e.g. lift_fused_2d) stay undumped


@pytest.fixture(scope="module")
def dump_dir(tiny_graph, tmp_path_factory):
    g = tiny_graph(1)
    B, F, N = 1, 1, 6
    imgs = np.asarray(g["imgs"])  # (B,F,N,H,W,3)
    depth = np.asarray(g["depth"])
    m = {k: np.asarray(v) for k, v in g["metas"].items()}

    inputs = {
        "imgs": imgs.reshape(B, F * N, *imgs.shape[3:]).transpose(0, 1, 4, 2, 3),
        "depth": depth.reshape(B, F * N, *depth.shape[3:]),
        "sensor2egos": m["sensor2egos"].reshape(B, F * N, 4, 4),
        "ego2globals": m["ego2globals"].reshape(B, F * N, 4, 4),
        "intrins": m["intrins"].reshape(B, F * N, 3, 3),
        "post_rots": m["post_rots"].reshape(B, F * N, 3, 3),
        "post_trans": m["post_trans"].reshape(B, F * N, 3),
        "bda": m["bda"],
    }

    jax_side = run_jax_boundaries(g["model"], g["params"],
                                  {"imgs": g["imgs"], "depth": g["depth"],
                                   "metas": g["metas"]}, g["ovw"])
    bnd = {"outputs#0/ov_classifier_weight": np.asarray(g["ovw"])}
    for name, arr in jax_side.items():
        bnd.update(_torchify(name, arr))

    d = tmp_path_factory.mktemp("parity_dump")
    np.savez(d / "inputs.npz", **inputs)
    np.savez(d / "boundaries.npz", **bnd)
    (d / "manifest.json").write_text(json.dumps(
        {"boundaries": sorted({k.split("#")[0] for k in bnd})}))
    return str(d), g, jax_side


def test_comparator_green_on_faithful_dump(dump_dir):
    d, g, jax_side = dump_dir
    rows = compare_dumps(d, g["model"], g["params"])
    report = format_report(rows)
    by_name = {r["boundary"]: r for r in rows}
    # every boundary that exists on both sides compares ok (same arrays up
    # to the adapter round-trip, so cos == 1 within float noise)
    compared = [r for r in rows if r["ok"] is not None]
    assert compared, report
    assert all(r["ok"] for r in compared), report
    # the big semantic ones actually got compared, not silently skipped
    # (the tiny preset's rec-head entry layer, not the veon_b layer 9)
    entry_layer = f"clip_tokens.{g['cfg'].san.feature_last_layer_idx}"
    for must in ("sa_mask_preds", "rec_mask_embs", "hsa_supp", "lift_vox",
                 "occ_bin", "out_feat_occ", entry_layer):
        assert any(b == must or b.startswith(must) for b in by_name
                   if by_name[b]["ok"]), (must, report)


def test_comparator_red_on_corrupted_boundary(dump_dir, tmp_path):
    d, g, _ = dump_dir
    bnd = dict(np.load(d + "/boundaries.npz"))
    key = "rec_mask_embs#0"
    bnd[key] = bnd[key] + 0.5 * np.abs(bnd[key]).max()
    import shutil

    d2 = tmp_path / "corrupt"
    shutil.copytree(d, d2)
    np.savez(d2 / "boundaries.npz", **bnd)
    rows = compare_dumps(str(d2), g["model"], g["params"])
    by = {r["boundary"]: r for r in rows}
    assert by["rec_mask_embs"]["ok"] is False, format_report(rows)
    # and an unrelated boundary still passes (corruption is localized)
    assert by["sa_mask_preds"]["ok"], format_report(rows)


def test_tolerance_table_covers_all_emitted_boundaries(dump_dir):
    _, _, jax_side = dump_dir
    for name in jax_side:
        base = name.split(".")[0]
        assert base in BOUNDARIES or name in BOUNDARIES or base in (
            "lift_fused_2d",), f"no default tolerance for {name}"


def test_dump_script_is_standalone():
    """dump_reference.py runs inside the TORCH environment (reference repo +
    checkpoints) — it must import NOTHING beyond stdlib at module level (no
    jax, no veon_tpu, not even numpy/torch: those load lazily inside
    functions so `--help` works anywhere)."""
    import ast
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "veon_tpu",
                        "parity", "dump_reference.py")
    tree = ast.parse(open(path).read())
    tops = [n for n in ast.walk(tree)
            if isinstance(n, (ast.Import, ast.ImportFrom))
            and n.col_offset == 0]
    names = {a.name if isinstance(n, ast.Import) else n.module
             for n in tops for a in getattr(n, "names", [])}
    assert names <= {"argparse", "json", "os"}, names


# ---------------------------------------------------------------------------
# F>1 (temporal) dumps: per-frame boundary table (round-4 verdict weak #5)
# ---------------------------------------------------------------------------


def _pack_cam_major(x, B, F, N):
    """Ours (B,F,N,...) -> the dump's (B, N*F, ...) cam-major/frame-minor."""
    return np.swapaxes(np.asarray(x), 1, 2).reshape((B, N * F) + x.shape[3:])


def _torchify_t(name, arr, B, N, F):
    """jax boundary (possibly @p-tagged) -> torch-dump npz entries for an
    F-frame dump. Per-frame call index: @p<i> -> call i-1, bare -> F-1."""
    a = np.asarray(arr)
    base, _, tag = name.partition("@")
    c = int(tag[1:]) - 1 if tag else F - 1

    def cam_major_flat(x):  # (B*F*N frame-major, ...) -> (B*N*F cam-major)
        x = x.reshape((B, F, N) + x.shape[1:])
        return np.swapaxes(x, 1, 2).reshape((B * N * F,) + x.shape[3:])

    def tile_frames(x):  # current-only (B*N,...) -> (B*N*F,...) frame 0 = x
        x = x.reshape((B, N, 1) + x.shape[1:])
        return np.broadcast_to(
            x, (B, N, F) + x.shape[3:]).reshape((B * N * F,) + x.shape[3:])

    if base.startswith("clip_tokens."):
        sub = base.split(".", 1)[1]
        if sub.endswith("_cls"):  # ours (BFN,1,C) frame-major
            return {f"clip_tokens#0/{sub[:-4]}_cls_token":
                    cam_major_flat(a).transpose(1, 0, 2)}
        return {f"clip_tokens#0/{sub}":
                cam_major_flat(a).transpose(0, 3, 1, 2)}
    if base == "sa_mask_preds":
        return {"side_adapter#0/0/0": tile_frames(a)}
    if base == "sa_attn_bias":
        return {"side_adapter#0/1/0": tile_frames(a)}
    if base == "rec_mask_embs":
        return {"rec_mask_embs#0": tile_frames(a)}
    if base == "rec_update_proj":
        return {f"rec_update#{c}/clip_feat_proj": a.transpose(0, 3, 1, 2)}
    if base == "hsa_attn_dense":
        return {f"hsa#{c}/1/{i}": a[i] for i in range(a.shape[0])}
    if base == "hsa_supp":
        return {f"hsa#{c}/2/0": a.transpose(0, 3, 1, 2)}
    if base == "lift_vox":
        return {f"lift#{c}": a.transpose(0, 4, 1, 2, 3)}
    if base == "occ_early":  # prev frames only; call index == prev index
        return {f"occ_early#{c}": a.transpose(0, 4, 1, 2, 3)}
    if base in ("occ_bin", "occ_feat"):
        key = "bin_occ" if base == "occ_bin" else "feat_occ"
        return {f"occ_heads#0/{key}": a.transpose(0, 4, 1, 2, 3)}
    if base in ("out_sem_seg_ds", "out_sem_embed_ds", "out_clip_feat"):
        return {f"outputs#0/{base[4:]}": a.transpose(0, 1, 4, 2, 3)}
    if base in ("out_bin_occ", "out_feat_occ"):
        return {f"outputs#0/{base[4:]}": a.transpose(0, 4, 1, 2, 3)}
    return {}


@pytest.fixture(scope="module")
def dump_dir_t2(tiny_graph, tmp_path_factory):
    g = tiny_graph(2)
    B, F, N = 1, 2, 6
    imgs = np.asarray(g["imgs"])
    depth = np.asarray(g["depth"])
    m = {k: np.asarray(v) for k, v in g["metas"].items()}

    inputs = {
        "imgs": _pack_cam_major(imgs, B, F, N).transpose(0, 1, 4, 2, 3),
        "depth": _pack_cam_major(depth, B, F, N),
        "sensor2egos": _pack_cam_major(m["sensor2egos"], B, F, N),
        "ego2globals": _pack_cam_major(m["ego2globals"], B, F, N),
        "intrins": _pack_cam_major(m["intrins"], B, F, N),
        "post_rots": _pack_cam_major(m["post_rots"], B, F, N),
        "post_trans": _pack_cam_major(m["post_trans"], B, F, N),
        "bda": m["bda"],
        "adj_meta_0": m["lidarego2global"],
        "adj_meta_1": m["prev_lidarego2global"][:, 0],
    }
    jax_side = run_jax_boundaries(g["model"], g["params"],
                                  {"imgs": g["imgs"], "depth": g["depth"],
                                   "metas": g["metas"]}, g["ovw"])
    bnd = {"outputs#0/ov_classifier_weight": np.asarray(g["ovw"])}
    for name, arr in jax_side.items():
        bnd.update(_torchify_t(name, arr, B, N, F))

    d = tmp_path_factory.mktemp("parity_dump_t2")
    np.savez(d / "inputs.npz", **inputs)
    np.savez(d / "boundaries.npz", **bnd)
    (d / "manifest.json").write_text(json.dumps(
        {"boundaries": sorted({k.split("#")[0] for k in bnd})}))
    return str(d), g, jax_side


def test_comparator_t2_per_frame_table(dump_dir_t2):
    """F=2 dump -> a PER-FRAME boundary table (not the old outputs-only
    fallback): previous-frame boundaries (@p1) and the current frame both
    compare green on a faithful dump."""
    d, g, jax_side = dump_dir_t2
    assert any(k.endswith("@p1") for k in jax_side), sorted(jax_side)
    rows = compare_dumps(d, g["model"], g["params"])
    report = format_report(rows)
    by = {r["boundary"]: r for r in rows}
    for must in ("lift_vox", "lift_vox@p1", "occ_early@p1",
                 "hsa_attn_dense@p1", "hsa_supp@p1", "rec_update_proj@p1",
                 "sa_mask_preds", "rec_mask_embs", "occ_bin", "out_feat_occ"):
        assert by.get(must, {}).get("ok"), (must, report)
    compared = [r for r in rows if r["ok"] is not None]
    assert all(r["ok"] for r in compared), report


def test_comparator_t2_red_on_prev_frame_corruption(dump_dir_t2, tmp_path):
    """Corrupting ONLY the previous frame's lift localizes: @p1 rows fail,
    the current frame's stay green."""
    import shutil

    d, g, _ = dump_dir_t2
    bnd = dict(np.load(d + "/boundaries.npz"))
    bnd["lift#0"] = bnd["lift#0"] + 0.5 * np.abs(bnd["lift#0"]).max() + 1.0
    d2 = tmp_path / "corrupt_t2"
    shutil.copytree(d, d2)
    np.savez(d2 / "boundaries.npz", **bnd)
    rows = compare_dumps(str(d2), g["model"], g["params"])
    by = {r["boundary"]: r for r in rows}
    assert by["lift_vox@p1"]["ok"] is False, format_report(rows)
    assert by["lift_vox"]["ok"], format_report(rows)


# ---------------------------------------------------------------------------
# ZoeDepth configs: depth leg + zoe_core trunk boundary (verdict weak #5)
# ---------------------------------------------------------------------------


def test_comparator_zoe_depth_leg(tiny_graph, tmp_path):
    """A zoe-config dump with depth_imgs + zoe_core compares the metric
    depth AND the MiDaS-core rel-depth trunk boundary (localizing trunk vs
    metric-bins-head mismatches), alongside the semantic boundaries."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from veon_tpu.configs.base import ZoeConfig

    g = tiny_graph(1)
    B, F, N = 1, 1, 6
    cfg = dataclasses.replace(
        g["cfg"], depth_mode="zoedepth",
        zoe=ZoeConfig(width=32, depth=2, heads=2, patch_size=16,
                      hooks=(0, 1, 1, 1), pyramid_channels=(8, 16, 16, 16),
                      features=8, n_bins=6, bin_embedding_dim=8,
                      n_attractors=(4, 2, 2, 1), lora_r=2),
        data=dataclasses.replace(g["cfg"].data, depth_norm_method="midas"))
    from veon_tpu.model.veon import VeonModel

    model = VeonModel(cfg=cfg)
    rng = np.random.default_rng(1)
    dh, dw = cfg.data.depth_input_size
    depth_imgs = jnp.asarray(
        rng.standard_normal((B, F, N, dh, dw, 3)).astype(np.float32))
    params = jax.jit(model.init, static_argnames=("train", "method"))(
        jax.random.PRNGKey(1), g["imgs"], depth_imgs, g["metas"], g["ovw"],
        train=False, method=VeonModel.full_forward)
    # self-consistent dump: the semantic depth IS estimate_depth(depth_imgs)
    dp, state = jax.jit(
        model.apply,
        static_argnames=("method", "capture_intermediates", "mutable"),
    )(params, depth_imgs, method="estimate_depth",
      capture_intermediates=lambda m, _: getattr(m, "name", None) == "core",
      mutable=("intermediates",))
    rel = None
    for node in jax.device_get(state["intermediates"]).values():
        if isinstance(node, dict) and "core" in node:
            for call in node["core"].get("__call__", ()):
                rel = np.asarray(call[0] if isinstance(call, tuple) else call)
    assert rel is not None
    depth = jnp.asarray(dp)

    jax_side = run_jax_boundaries(model, params,
                                  {"imgs": g["imgs"], "depth": depth,
                                   "metas": g["metas"]}, g["ovw"])
    bnd = {"outputs#0/ov_classifier_weight": np.asarray(g["ovw"]),
           "zoe_core#0/0": rel}
    for name, arr in jax_side.items():
        bnd.update(_torchify(name, arr))
    imgs = np.asarray(g["imgs"])
    m = {k: np.asarray(v) for k, v in g["metas"].items()}
    inputs = {
        "imgs": imgs.reshape(B, F * N, *imgs.shape[3:]).transpose(0, 1, 4, 2, 3),
        "depth": np.asarray(depth).reshape(B, F * N, *depth.shape[-2:]),
        "depth_imgs_flat": np.asarray(depth_imgs).reshape(
            B * F * N, dh, dw, 3).transpose(0, 3, 1, 2),
        "sensor2egos": m["sensor2egos"].reshape(B, F * N, 4, 4),
        "ego2globals": m["ego2globals"].reshape(B, F * N, 4, 4),
        "intrins": m["intrins"].reshape(B, F * N, 3, 3),
        "post_rots": m["post_rots"].reshape(B, F * N, 3, 3),
        "post_trans": m["post_trans"].reshape(B, F * N, 3),
        "bda": m["bda"],
    }
    d = tmp_path / "zoe_dump"
    d.mkdir()
    np.savez(d / "inputs.npz", **inputs)
    np.savez(d / "boundaries.npz", **bnd)
    (d / "manifest.json").write_text(json.dumps(
        {"boundaries": sorted({k.split("#")[0] for k in bnd})}))

    rows = compare_dumps(str(d), model, params)
    report = format_report(rows)
    by = {r["boundary"]: r for r in rows}
    for must in ("depth_pred", "zoe_rel_depth", "lift_vox", "out_feat_occ"):
        assert by.get(must, {}).get("ok"), (must, report)
    compared = [r for r in rows if r["ok"] is not None]
    assert all(r["ok"] for r in compared), report
