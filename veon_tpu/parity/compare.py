"""JAX-side activation-parity comparator (weights-day harness).

Replays a reference dump (written by `parity/dump_reference.py` inside the
torch environment) through the converted-weight veon_tpu model and checks
every module boundary within per-boundary tolerances, so validating real
checkpoints is MECHANICAL: convert -> `veon_tpu parity --dumps <dir>` ->
read the table.

Boundary-level comparison requires an F=1 (single-frame) dump — the
recommended weights-day config — because the reference packs previous
frames into the same B*F*N camera axis with its own split convention
(`san_in_veon_temporal.py:146-160`); with F>1 dumps only the final outputs
are compared.

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
    """Torch dump layout -> this repo's (B, F, N, ...) jax batch."""
    import jax.numpy as jnp

    imgs = inputs["imgs"]  # (B, F*N, 3, H, W)
    B, FN = imgs.shape[:2]
    F = FN // num_cams
    N = num_cams

    def cams(x, trailing):
        return jnp.asarray(x.reshape((B, F, N) + x.shape[2:][:trailing]))

    batch = {
        "imgs": jnp.asarray(
            imgs.reshape(B, F, N, *imgs.shape[2:]).transpose(0, 1, 2, 4, 5, 3)),
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
        d = inputs["depth_imgs_flat"]  # (B*F*N, 3, Hd, Wd)
        batch["depth_imgs"] = jnp.asarray(
            d.reshape(B, F, N, *d.shape[1:]).transpose(0, 1, 2, 4, 5, 3))
    return batch, F


def _densify_hsa(factors: np.ndarray) -> np.ndarray:
    """(A, B, L, heads, dh) factors -> dense (A, B, heads, L, L) bias
    (`highres_side_adaptor.py:182`: bias = f @ f^T per attn layer/head)."""
    return np.einsum("ablhd,abmhd->abhlm", factors, factors)


def run_jax_boundaries(model, variables, batch, ov_weight) -> Dict[str, np.ndarray]:
    """Forward the converted model capturing the boundary modules' outputs."""
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
    for c in calls("rec_head", "update_remaining"):
        if isinstance(c, dict) and "clip_feat_proj" in c:
            got["rec_update_proj"] = np.asarray(c["clip_feat_proj"])
    for c in calls("hsa"):
        factors, supp = c
        got["hsa_attn_dense"] = _densify_hsa(np.asarray(factors))
        got["hsa_supp"] = np.asarray(supp)
    for c in calls("lift_fusion"):
        got["lift_fused_2d"] = np.asarray(c)
    for c in calls("alignnet"):
        got["occ_bin"] = np.asarray(c["bin_occ"])
        got["occ_feat"] = np.asarray(c["feat_occ"])
    if "early_vox" in out:
        got["lift_vox"] = np.asarray(out["early_vox"])
    for k in ("sem_seg_ds", "sem_embed_ds", "clip_feat", "bin_occ",
              "feat_occ"):
        got[f"out_{k}"] = np.asarray(out[k])
    return got


def _nchw(x):
    return x.transpose(0, 2, 3, 1)


def reference_boundaries(bnd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Torch dump keys/layouts -> comparator keys in this repo's layouts.

    Keys follow dump_reference.py's flattener: "<boundary>#<call>/<path>".
    Uses the LAST call of per-frame modules (the current frame — the
    reference runs previous frames first, `san_in_veon_temporal.py:158-173`;
    with F=1 there is exactly one call).
    """
    ref: Dict[str, np.ndarray] = {}

    def last_call(prefix):
        idxs = {int(k.split("#")[1].split("/")[0])
                for k in bnd if k.startswith(prefix + "#")}
        return max(idxs) if idxs else None

    c = last_call("clip_tokens")
    if c is not None:
        for k, v in bnd.items():
            if not k.startswith(f"clip_tokens#{c}/"):
                continue
            sub = k.split("/", 1)[1]
            if sub.endswith("_cls_token"):
                ref[f"clip_tokens.{sub[:-10]}_cls"] = v.transpose(1, 0, 2)
            else:
                ref[f"clip_tokens.{sub}"] = _nchw(v)
    c = last_call("side_adapter")
    if c is not None:
        # (mask_preds list, attn_biases list-of-list, san_features): eval
        # mode emits a single deep-supervision stage (decode_masks,
        # side_adaptor_in_veon.py:181-192)
        mp = [k for k in bnd if k.startswith(f"side_adapter#{c}/0/")]
        if mp:
            ref["sa_mask_preds"] = bnd[sorted(mp)[-1]]
        ab = [k for k in bnd if k.startswith(f"side_adapter#{c}/1/")]
        if ab:
            ref["sa_attn_bias"] = bnd[sorted(ab)[-1]]
    c = last_call("rec_mask_embs")
    if c is not None:
        ref["rec_mask_embs"] = bnd[f"rec_mask_embs#{c}"]
    c = last_call("hsa")
    if c is not None:
        # (offsets, attns, supp); attns dense (A,B,heads,L,L); supp is the
        # LAST entry of the supp list (the consumed one)
        att = sorted(k for k in bnd if k.startswith(f"hsa#{c}/1/"))
        if att:
            ref["hsa_attn_dense"] = np.stack([bnd[k] for k in att]) \
                if bnd[att[0]].ndim == 4 else bnd[att[-1]]
        supp = sorted(k for k in bnd if k.startswith(f"hsa#{c}/2/"))
        if supp:
            ref["hsa_supp"] = _nchw(bnd[supp[-1]])
        elif f"hsa#{c}/2" in bnd:
            ref["hsa_supp"] = _nchw(bnd[f"hsa#{c}/2"])
    c = last_call("lift")
    if c is not None:
        v = bnd[f"lift#{c}"] if f"lift#{c}" in bnd else bnd.get(f"lift#{c}/0")
        if v is not None and v.ndim == 5:  # (B, C, Z, Y, X)
            ref["lift_vox"] = v.transpose(0, 2, 3, 4, 1)
    c = last_call("rec_update")
    if c is not None:
        v = bnd.get(f"rec_update#{c}/clip_feat_proj")
        if v is not None and v.ndim == 4:  # (BN, C, h, w)
            ref["rec_update_proj"] = _nchw(v)
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

    ref = reference_boundaries(bnd)
    got: Dict[str, np.ndarray] = {}
    if F == 1:
        got.update(run_jax_boundaries(model, variables, batch, ovw))
    else:
        log(f"F={F} dump: boundary-level comparison needs F=1 — "
            "comparing final outputs only")
        import jax

        out = jax.jit(model.apply, static_argnames=("train",))(
            variables, batch["imgs"], batch["depth"], batch["metas"], ovw,
            train=False)
        for k in ("sem_seg_ds", "sem_embed_ds", "clip_feat", "bin_occ",
                  "feat_occ"):
            got[f"out_{k}"] = np.asarray(out[k])
    if "depth_imgs" in batch and "depth" in inputs:
        import jax

        dp = jax.jit(model.apply, static_argnames=("method",))(
            variables, batch["depth_imgs"], method="estimate_depth")
        got["depth_pred"] = np.asarray(dp)
        B, FN = inputs["depth"].shape[:2]
        ref["depth_pred"] = inputs["depth"].reshape(got["depth_pred"].shape)

    tols = dict(BOUNDARIES)
    tols.update(tol_overrides or {})
    rows = []
    for name in sorted(set(ref) & set(got)):
        base = name.split(".")[0]
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
