"""JAX-side activation-parity comparator (weights-day harness).

Replays a reference dump (written by `parity/dump_reference.py` inside the
torch environment) through the converted-weight veon_tpu model and checks
every module boundary within per-boundary tolerances, so validating real
checkpoints is MECHANICAL: convert -> `veon_tpu parity --dumps <dir>` ->
read the table.

F>1 (temporal) dumps get a PER-FRAME boundary table: the reference packs
frames into the B*N*F camera axis CAM-major/frame-minor with frame 0 =
current (`split_image_style_tensors`, `san_in_veon_temporal.py:315-319`),
and its per-frame modules (hsa / rec_update / lift / occ_early) fire once
per frame, previous frames first, current last — matching this model's
call order — so call index j maps directly. Per-frame boundaries carry an
`@p<i>` suffix for previous frame i (1-based); the bare name is the
current frame. Single-call boundaries (clip trunk, side adapter, rec head)
run over all frames at once on the reference side and are sliced to the
current frame before comparison.

Layout adapters (torch -> this repo):
  images/features   NCHW -> NHWC
  clip tokens       ClipOutput {k: (BN,C,h,w), "k_cls_token": (1,BN,C)}
                    -> {"k": (BN,h,w,C), "k_cls": (BN,1,C)}
  3D grids          (B,C,Z,Y,X) -> (B,Z,Y,X,C)
  hsa attn bias     reference materializes dense (A,B,heads,L,L)
                    (`highres_side_adaptor.py:182`); ours returns the
                    factors (A,B,L,heads,dh) — densified here for the check

Metrics per boundary: cosine over the flattened pair + max relative error
(max|a-b| / max|ref|). Default tolerances are per-boundary (deeper in the
graph = looser, error accumulates through ~30 matmul layers in fp32).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class Tol:
    cos_min: float = 0.999
    rel_max: float = 5e-3


# boundary name -> default tolerance. Early boundaries (one module deep)
# are tight; the 3D stage accumulates (lift scatter + BN + trilinear).
BOUNDARIES: Dict[str, Tol] = {
    "depth_pred": Tol(0.999, 1e-2),
    "zoe_rel_depth": Tol(0.999, 1e-2),
    "occ_early": Tol(0.998, 2e-2),
    "clip_tokens": Tol(0.9995, 5e-3),
    "sa_mask_preds": Tol(0.999, 1e-2),
    "sa_attn_bias": Tol(0.999, 1e-2),
    "rec_mask_embs": Tol(0.999, 1e-2),
    "rec_update_proj": Tol(0.999, 1e-2),
    "hsa_attn_dense": Tol(0.999, 1e-2),
    "hsa_supp": Tol(0.999, 1e-2),
    "lift_fused_2d": Tol(0.998, 2e-2),
    "lift_vox": Tol(0.998, 2e-2),
    "occ_bin": Tol(0.995, 5e-2),
    "occ_feat": Tol(0.995, 5e-2),
    "out_sem_seg_ds": Tol(0.995, 5e-2),
    "out_sem_embed_ds": Tol(0.995, 5e-2),
    "out_clip_feat": Tol(0.995, 5e-2),
    "out_bin_occ": Tol(0.995, 5e-2),
    "out_feat_occ": Tol(0.995, 5e-2),
}


def _metrics(ref: np.ndarray, got: np.ndarray):
    ref = np.asarray(ref, np.float32).reshape(-1)
    got = np.asarray(got, np.float32).reshape(-1)
    denom = float(np.linalg.norm(ref) * np.linalg.norm(got))
    cos = float(ref @ got / denom) if denom > 0 else 1.0
    scale = float(np.abs(ref).max())
    rel = float(np.abs(ref - got).max() / (scale + 1e-12))
    return cos, rel


def load_dumps(dumps_dir: str):
    inputs = dict(np.load(os.path.join(dumps_dir, "inputs.npz")))
    boundaries = dict(np.load(os.path.join(dumps_dir, "boundaries.npz")))
    manifest = {}
    mpath = os.path.join(dumps_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    return inputs, boundaries, manifest


def batch_from_inputs(inputs: Dict[str, np.ndarray], num_cams: int = 6):
    """Torch dump layout -> this repo's (B, F, N, ...) jax batch.

    The dump's camera axis is (N, F) CAM-major/frame-minor with frame 0 =
    current (`split_image_style_tensors` reshapes (B, n_cam, N_T, ...)),
    while this repo is frame-major — unpack (B, N, F) then swap. F=1 is
    layout-identical either way."""
    import jax.numpy as jnp

    imgs = inputs["imgs"]  # (B, N*F, 3, H, W) cam-major
    B, FN = imgs.shape[:2]
    F = FN // num_cams
    N = num_cams

    def cams(x, trailing):
        x = x.reshape((B, N, F) + x.shape[2:][:trailing])
        return jnp.asarray(np.swapaxes(x, 1, 2))

    batch = {
        "imgs": jnp.asarray(
            imgs.reshape(B, N, F, *imgs.shape[2:]).transpose(0, 2, 1, 4, 5, 3)),
        "depth": cams(inputs["depth"], 2),
        "metas": {
            "sensor2egos": cams(inputs["sensor2egos"], 2),
            "ego2globals": cams(inputs["ego2globals"], 2),
            "intrins": cams(inputs["intrins"], 2),
            "post_rots": cams(inputs["post_rots"], 2),
            "post_trans": cams(inputs["post_trans"], 1),
            "bda": jnp.asarray(inputs["bda"]),
        },
    }
    if "adj_meta_0" in inputs:
        batch["metas"]["lidarego2global"] = jnp.asarray(inputs["adj_meta_0"])
    prevs = []
    i = 1
    while f"adj_meta_{i}" in inputs:
        prevs.append(inputs[f"adj_meta_{i}"])
        i += 1
    if prevs:
        batch["metas"]["prev_lidarego2global"] = jnp.asarray(
            np.stack(prevs, axis=1))
    if "depth_imgs_flat" in inputs:
        d = inputs["depth_imgs_flat"]  # (B*N*F, 3, Hd, Wd) cam-major
        batch["depth_imgs"] = jnp.asarray(
            d.reshape(B, N, F, *d.shape[1:]).transpose(0, 2, 1, 4, 5, 3))
    return batch, F


def _densify_hsa(factors: np.ndarray) -> np.ndarray:
    """(A, B, L, heads, dh) factors -> dense (A, B, heads, L, L) bias
    (`highres_side_adaptor.py:182`: bias = f @ f^T per attn layer/head)."""
    return np.einsum("ablhd,abmhd->abhlm", factors, factors)


def _frame_tag(j: int, n_calls: int) -> str:
    """Per-frame key suffix: calls run prev frames first (f=1..F-1), the
    current frame LAST — bare name for current, `@p<i>` for previous i."""
    return "" if j == n_calls - 1 else f"@p{j + 1}"


def run_jax_boundaries(model, variables, batch, ov_weight) -> Dict[str, np.ndarray]:
    """Forward the converted model capturing the boundary modules' outputs.

    Per-frame modules (hsa / rec_update / lift-vox) fire once per frame;
    their previous-frame calls get `@p<i>`-suffixed keys (F=1 emits exactly
    the bare-name table)."""
    import jax

    capture = {"clip_visual", "side_adapter", "rec_head", "hsa",
               "lift_fusion", "alignnet"}

    def filt(mdl, _method):
        return getattr(mdl, "name", None) in capture

    out, state = jax.jit(
        model.apply,
        static_argnames=("train", "capture_intermediates", "mutable",
                         "return_early_vox"),
    )(variables, batch["imgs"], batch["depth"], batch["metas"], ov_weight,
      train=False, return_early_vox=True,
      capture_intermediates=filt, mutable=("intermediates",))
    inter = jax.device_get(state["intermediates"])
    out = jax.device_get(out)

    got: Dict[str, np.ndarray] = {}

    def calls(name, method="__call__"):
        node = inter.get(name, {})
        return node.get(method, ())

    for c in calls("clip_visual"):
        for k, v in c.items():
            got[f"clip_tokens.{k}"] = np.asarray(v)
    for c in calls("side_adapter"):
        mask_preds, attn_bias, _ = c
        got["sa_mask_preds"] = np.asarray(mask_preds)
        got["sa_attn_bias"] = np.asarray(attn_bias)
    for c in calls("rec_head"):
        got["rec_mask_embs"] = np.asarray(c)
    upd = calls("rec_head", "update_remaining")
    for j, c in enumerate(upd):
        if isinstance(c, dict) and "clip_feat_proj" in c:
            got[f"rec_update_proj{_frame_tag(j, len(upd))}"] = \
                np.asarray(c["clip_feat_proj"])
    hsa_calls = calls("hsa")
    for j, c in enumerate(hsa_calls):
        factors, supp = c
        tag = _frame_tag(j, len(hsa_calls))
        got[f"hsa_attn_dense{tag}"] = _densify_hsa(np.asarray(factors))
        got[f"hsa_supp{tag}"] = np.asarray(supp)
    lf = calls("lift_fusion")
    for j, c in enumerate(lf):
        got[f"lift_fused_2d{_frame_tag(j, len(lf))}"] = np.asarray(c)
    for c in calls("alignnet"):
        got["occ_bin"] = np.asarray(c["bin_occ"])
        got["occ_feat"] = np.asarray(c["feat_occ"])
    # per-frame early vox (sown in _early_vox, prev frames first): the
    # analog of the reference's lift / occ_early boundaries per frame
    vox_frames = inter.get("early_vox_frames", ())
    for j, v in enumerate(vox_frames):
        tag = _frame_tag(j, len(vox_frames))
        got[f"lift_vox{tag}"] = np.asarray(v)
        if tag:
            got[f"occ_early{tag}"] = np.asarray(v)
    if not vox_frames and "early_vox" in out:
        got["lift_vox"] = np.asarray(out["early_vox"])
    for k in ("sem_seg_ds", "sem_embed_ds", "clip_feat", "bin_occ",
              "feat_occ"):
        got[f"out_{k}"] = np.asarray(out[k])
    return got


def _nchw(x):
    return x.transpose(0, 2, 3, 1)


def reference_boundaries(bnd: Dict[str, np.ndarray], B: int = 1, F: int = 1,
                         num_cams: int = 6) -> Dict[str, np.ndarray]:
    """Torch dump keys/layouts -> comparator keys in this repo's layouts.

    Keys follow dump_reference.py's flattener: "<boundary>#<call>/<path>".
    Per-frame modules fire once per frame, previous frames first and the
    current frame LAST (`san_in_veon_temporal.py:158-173`) — call j gets
    the same `@p<i>`/bare tag as the jax side. Single-call boundaries run
    over all B*N*F frames cam-major; the current frame is sliced out
    (this model runs the decode on the current frame only).
    """
    ref: Dict[str, np.ndarray] = {}

    def cur(x):
        """(B*N*F, ...) cam-major -> current-frame (B*N, ...)."""
        if F == 1 or x.shape[0] != B * num_cams * F:
            return x
        bn = B * num_cams
        return x.reshape((B, num_cams, F) + x.shape[1:])[:, :, 0] \
                .reshape((bn,) + x.shape[1:])

    def frame_major(x, axis=0):
        """(..., B*N*F, ...) cam-major -> frame-major (this model's CLIP
        trunk runs ALL frames in one flattened (B, F, N) pass)."""
        if F == 1 or x.shape[axis] != B * num_cams * F:
            return x
        x = np.moveaxis(x, axis, 0)
        x = x.reshape((B, num_cams, F) + x.shape[1:])
        x = np.swapaxes(x, 1, 2).reshape((B * F * num_cams,) + x.shape[3:])
        return np.moveaxis(x, 0, axis)

    def all_calls(prefix):
        idxs = {int(k.split("#")[1].split("/")[0])
                for k in bnd if k.startswith(prefix + "#")}
        return sorted(idxs)

    def last_call(prefix):
        idxs = all_calls(prefix)
        return idxs[-1] if idxs else None

    c = last_call("clip_tokens")
    if c is not None:
        for k, v in bnd.items():
            if not k.startswith(f"clip_tokens#{c}/"):
                continue
            sub = k.split("/", 1)[1]
            if sub.endswith("_cls_token"):
                ref[f"clip_tokens.{sub[:-10]}_cls"] = frame_major(
                    v.transpose(1, 0, 2))
            else:
                ref[f"clip_tokens.{sub}"] = frame_major(_nchw(v))
    c = last_call("side_adapter")
    if c is not None:
        # (mask_preds list, attn_biases list-of-list, san_features): eval
        # mode emits a single deep-supervision stage (decode_masks,
        # side_adaptor_in_veon.py:181-192)
        mp = [k for k in bnd if k.startswith(f"side_adapter#{c}/0/")]
        if mp:
            ref["sa_mask_preds"] = cur(bnd[sorted(mp)[-1]])
        ab = [k for k in bnd if k.startswith(f"side_adapter#{c}/1/")]
        if ab:
            ref["sa_attn_bias"] = cur(bnd[sorted(ab)[-1]])
    c = last_call("rec_mask_embs")
    if c is not None:
        ref["rec_mask_embs"] = cur(bnd[f"rec_mask_embs#{c}"])
    hsa_calls = all_calls("hsa")
    for j, c in enumerate(hsa_calls):
        tag = _frame_tag(j, len(hsa_calls))
        # (offsets, attns, supp); attns dense (A,B,heads,L,L); supp is the
        # LAST entry of the supp list (the consumed one)
        att = sorted(k for k in bnd if k.startswith(f"hsa#{c}/1/"))
        if att:
            ref[f"hsa_attn_dense{tag}"] = np.stack([bnd[k] for k in att]) \
                if bnd[att[0]].ndim == 4 else bnd[att[-1]]
        supp = sorted(k for k in bnd if k.startswith(f"hsa#{c}/2/"))
        if supp:
            ref[f"hsa_supp{tag}"] = _nchw(bnd[supp[-1]])
        elif f"hsa#{c}/2" in bnd:
            ref[f"hsa_supp{tag}"] = _nchw(bnd[f"hsa#{c}/2"])
    lift_calls = all_calls("lift")
    for j, c in enumerate(lift_calls):
        v = bnd[f"lift#{c}"] if f"lift#{c}" in bnd else bnd.get(f"lift#{c}/0")
        if v is not None and v.ndim == 5:  # (B, C, Z, Y, X)
            ref[f"lift_vox{_frame_tag(j, len(lift_calls))}"] = \
                v.transpose(0, 2, 3, 4, 1)
    for tid in all_calls("occ_early"):
        # forward_early returns fuse(0, ...) == the lift output for that
        # previous frame, PRE ego-align (align_net_occ3d.py:268-280 + the
        # wrap in dump_reference.py) — previous frames only
        v = bnd[f"occ_early#{tid}"] if f"occ_early#{tid}" in bnd \
            else bnd.get(f"occ_early#{tid}/0")
        if v is not None and v.ndim == 5:
            ref[f"occ_early@p{tid + 1}"] = v.transpose(0, 2, 3, 4, 1)
    upd_calls = all_calls("rec_update")
    for j, c in enumerate(upd_calls):
        v = bnd.get(f"rec_update#{c}/clip_feat_proj")
        if v is not None and v.ndim == 4:  # (BN, C, h, w)
            ref[f"rec_update_proj{_frame_tag(j, len(upd_calls))}"] = _nchw(v)
    c = last_call("zoe_core")
    if c is not None:
        # MidasCore(x, return_rel_depth=True) -> (rel_depth, features); the
        # rel-depth trunk boundary localizes zoe trunk-vs-bins mismatches
        v = bnd.get(f"zoe_core#{c}/0")
        if v is not None:
            ref["zoe_rel_depth"] = v
    c = last_call("occ_heads")
    if c is not None:
        for name, key in (("occ_bin", "bin_occ"), ("occ_feat", "feat_occ")):
            v = bnd.get(f"occ_heads#{c}/{key}")
            if v is not None:
                ref[name] = v.transpose(0, 2, 3, 4, 1)
    c = last_call("outputs")
    if c is not None:
        for name in ("sem_seg_ds", "sem_embed_ds", "clip_feat"):
            v = bnd.get(f"outputs#{c}/{name}")
            if v is not None:  # (B, N, C, h, w) -> (B, N, h, w, C)
                ref[f"out_{name}"] = v.transpose(0, 1, 3, 4, 2)
        for name in ("bin_occ", "feat_occ"):
            v = bnd.get(f"outputs#{c}/{name}")
            if v is not None:  # (B, C, Z, Y, X) -> (B, Z, Y, X, C)
                ref[f"out_{name}"] = v.transpose(0, 2, 3, 4, 1)
    return ref


def compare_dumps(
    dumps_dir: str,
    model,
    variables,
    tol_overrides: Optional[Dict[str, Tol]] = None,
    num_cams: int = 6,
    log: Callable[[str], None] = print,
) -> List[Dict]:
    """Returns a row per compared boundary:
    {boundary, cos, rel, cos_min, rel_max, ok, shape}."""
    inputs, bnd, _manifest = load_dumps(dumps_dir)
    batch, F = batch_from_inputs(inputs, num_cams=num_cams)
    # the dumped classifier weight makes the visual path self-contained
    # (text-encoder parity is covered by its own torch-pinned tests)
    import jax.numpy as jnp

    ovw = None
    for k, v in bnd.items():
        if k.endswith("/ov_classifier_weight"):
            ovw = jnp.asarray(v)
    if ovw is None:
        raise SystemExit(
            "dump has no ov_classifier_weight (outputs boundary) — "
            "re-dump with the stock dump_reference.py")

    B = int(inputs["imgs"].shape[0])
    ref = reference_boundaries(bnd, B=B, F=F, num_cams=num_cams)
    got: Dict[str, np.ndarray] = {}
    got.update(run_jax_boundaries(model, variables, batch, ovw))
    if "depth_imgs" in batch and "depth" in inputs:
        import jax

        if "zoe_rel_depth" in ref:
            # also capture the MiDaS-core trunk boundary (nn/zoedepth.py
            # `core`) so a zoe mismatch localizes to trunk vs bins
            dp, state = jax.jit(
                model.apply,
                static_argnames=("method", "capture_intermediates",
                                 "mutable"),
            )(variables, batch["depth_imgs"], method="estimate_depth",
              capture_intermediates=lambda m, _: getattr(m, "name", None) == "core",
              mutable=("intermediates",))
            inter = jax.device_get(state["intermediates"])
            for node in inter.values():
                if isinstance(node, dict) and "core" in node:
                    for call in node["core"].get("__call__", ()):
                        rel = call[0] if isinstance(call, tuple) else call
                        got["zoe_rel_depth"] = np.asarray(rel)
        else:
            dp = jax.jit(model.apply, static_argnames=("method",))(
                variables, batch["depth_imgs"], method="estimate_depth")
        got["depth_pred"] = np.asarray(dp)
        # (B, N*F, h2, w2) cam-major -> (B, F, N, h2, w2)
        d = inputs["depth"]
        d = d.reshape(B, num_cams, F, *d.shape[2:])
        ref["depth_pred"] = np.swapaxes(d, 1, 2)
        if "zoe_rel_depth" in ref and "zoe_rel_depth" in got:
            z = ref["zoe_rel_depth"]  # (B*N*F, H, W) cam-major
            z = z.reshape(B, num_cams, F, *z.shape[1:])
            ref["zoe_rel_depth"] = np.swapaxes(z, 1, 2).reshape(
                got["zoe_rel_depth"].shape)

    tols = dict(BOUNDARIES)
    tols.update(tol_overrides or {})
    rows = []
    for name in sorted(set(ref) & set(got)):
        base = name.split("@")[0].split(".")[0]
        tol = tols.get(name, tols.get(base, Tol()))
        r, g = ref[name], got[name]
        if r.shape != g.shape:
            rows.append({"boundary": name, "ok": False,
                         "error": f"shape {r.shape} vs {g.shape}"})
            continue
        cos, rel = _metrics(r, g)
        rows.append({"boundary": name, "cos": cos, "rel": rel,
                     "cos_min": tol.cos_min, "rel_max": tol.rel_max,
                     "shape": list(g.shape),
                     "ok": cos >= tol.cos_min and rel <= tol.rel_max})
    skipped = sorted(set(ref) ^ set(got))
    for name in skipped:
        side = "dump" if name in ref else "jax"
        rows.append({"boundary": name, "ok": None,
                     "error": f"only on the {side} side — skipped"})
    return rows


def format_report(rows: List[Dict]) -> str:
    lines = [f"{'boundary':<26} {'cos':>10} {'>=':>8} {'rel':>10} "
             f"{'<=':>8}  verdict"]
    for r in rows:
        if r["ok"] is None:
            lines.append(f"{r['boundary']:<26} {'-':>10} {'-':>8} {'-':>10} "
                         f"{'-':>8}  SKIP ({r['error']})")
        elif "error" in r:
            lines.append(f"{r['boundary']:<26} {'-':>10} {'-':>8} {'-':>10} "
                         f"{'-':>8}  FAIL ({r['error']})")
        else:
            lines.append(
                f"{r['boundary']:<26} {r['cos']:>10.6f} {r['cos_min']:>8} "
                f"{r['rel']:>10.4g} {r['rel_max']:>8}  "
                f"{'ok' if r['ok'] else 'FAIL'}")
    n_fail = sum(1 for r in rows if r["ok"] is False)
    n_ok = sum(1 for r in rows if r["ok"])
    lines.append(f"{n_ok} ok / {n_fail} failed / "
                 f"{sum(1 for r in rows if r['ok'] is None)} skipped")
    return "\n".join(lines)
