#!/usr/bin/env python
"""Dump activation boundaries from the REFERENCE (torch) VEON model.

STANDALONE — run inside the reference environment (torch + mmcv + mmdet3d +
released checkpoints), NOT in this repo's JAX environment. It imports
nothing from veon_tpu; copy this single file next to the reference repo:

    python dump_reference.py <config.py> <checkpoint.pth> --out dumps/ \
        [--sample-idx 0] [--depth-ckpt ckpts/...pth]

Writes:
    dumps/inputs.npz      the semantic model's exact inputs, torch layout:
                          imgs (B,FN,3,H,W), sensor2egos/ego2globals
                          (B,FN,4,4), intrins/post_rots (B,FN,3,3),
                          post_trans (B,FN,3), bda (B,3,3), depth
                          (B,FN,h2,w2), depth_imgs (B,FN,3,Hd,Wd),
                          adj_meta_<i>
    dumps/boundaries.npz  per-boundary activations, fp32, torch layouts,
                          keys "<boundary>#<call>/<path>" (call index for
                          modules that fire once per frame)
    dumps/manifest.json   boundary names, shapes, dtype table

Boundary map (reference `san_in_veon_temporal.py:113-218`,
`veon_temporal.py:201-259`, `align_net_occ3d.py:238-318`):
    depth_trunk    VeonTemporal.depth_estimator raw output (metric_depth
                   BEFORE the detector's align_corners resize)
    zoe_core       (zoe configs) MidasCore (rel_depth, features) — splits
                   the BEiT trunk from the metric-bins head
                   (zoedepth_nk_v1.py:194)
    clip_tokens    FeatureExtractor ClipOutput: {k: (BFN,C,h,w),
                   "<k>_cls_token": (1,BFN,C)} per saved layer
    side_adapter   (mask_preds list, attn_biases list, san_features)
    rec_mask_embs  clip_rec_head(features, attn_bias, normalize=True)
    rec_update     clip_rec_head.update_remaining_clip_feats out dict
                   (incl. clip_feat_proj)
    hsa            highres_side_adaptor_network (offsets, attns, supp)
    lift           lss_view_transformer output voxel grid per fuse() call
    occ_early      occ_decoder.forward_early per previous frame
    occ_heads      occ_decoder.forward dict (bin_occ/feat_occ PRE-trilinear)
    outputs        the semantic model's final outputs dict (sem_seg_ds,
                   sem_embed_ds, clip_feat, bin_occ, feat_occ, sem_occ)

The JAX comparator (`python -m veon_tpu.cli.main parity --dumps dumps/`)
replays inputs.npz through the converted-weight veon_tpu model and checks
each boundary within per-boundary tolerances (veon_tpu/parity/compare.py
documents the layout adapters).
"""

import argparse
import json
import os


def _flatten(obj, prefix, out):
    """Recursively flatten tensors/dicts/sequences into {key: np.ndarray}."""
    import numpy as np
    import torch

    if isinstance(obj, torch.Tensor):
        out[prefix] = obj.detach().float().cpu().numpy().astype(np.float32)
    elif isinstance(obj, dict):  # includes ClipOutput(dict)
        for k, v in obj.items():
            _flatten(v, f"{prefix}/{k}", out)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _flatten(v, f"{prefix}/{i}", out)
    elif isinstance(obj, (int, float)):
        out[prefix] = np.asarray(obj, np.float32)
    # silently skip strings/None/metas-of-dicts — boundaries are tensor trees


class Recorder:
    def __init__(self):
        self.store = {}
        self.calls = {}

    def hook(self, name):
        def fn(_module, _inputs, output):
            c = self.calls.get(name, 0)
            self.calls[name] = c + 1
            _flatten(output, f"{name}#{c}", self.store)
        return fn

    def wrap_method(self, owner, attr, name):
        """Capture a plain method's output (no forward hook available)."""
        orig = getattr(owner, attr)

        def wrapped(*a, **kw):
            out = orig(*a, **kw)
            c = self.calls.get(name, 0)
            self.calls[name] = c + 1
            _flatten(out, f"{name}#{c}", self.store)
            return out

        setattr(owner, attr, wrapped)


def main():
    ap = argparse.ArgumentParser(
        description="Dump VEON reference activations for veon_tpu parity")
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--depth-ckpt", default=None,
                    help="override cfg.depth_load_from (dual-checkpoint "
                         "load, apis/train.py:316-325)")
    ap.add_argument("--out", default="dumps")
    ap.add_argument("--sample-idx", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import torch
    from mmcv import Config
    from mmcv.parallel import MMDataParallel
    from mmcv.parallel import scatter  # noqa: F401 (gpu path)
    from mmcv.runner import load_checkpoint

    from mmdet3d.datasets import build_dataloader, build_dataset
    from mmdet3d.models import build_model

    cfg = Config.fromfile(args.config)
    cfg.model.train_cfg = None
    dataset = build_dataset(cfg.data.test)
    loader = build_dataloader(dataset, samples_per_gpu=1, workers_per_gpu=0,
                              dist=False, shuffle=False)
    model = build_model(cfg.model, test_cfg=cfg.get("test_cfg"))
    load_checkpoint(model, args.checkpoint, map_location="cpu")
    depth_ckpt = args.depth_ckpt or cfg.get("depth_load_from")
    if depth_ckpt:
        rk = cfg.get("depth_revise_keys",
                     [(r"^depth_model\.", "depth_estimator.")])
        load_checkpoint(model, depth_ckpt, map_location="cpu",
                        revise_keys=rk)
    model.eval()

    use_gpu = torch.cuda.is_available()
    if use_gpu:
        model = MMDataParallel(model.cuda(), device_ids=[0])
        det = model.module
    else:
        det = model

    sm = det.semantic_model.model  # SANInVeonTemporal
    rec = Recorder()
    det.depth_estimator.register_forward_hook(rec.hook("depth_trunk"))
    # zoe configs: also hook the MiDaS core (BEiT trunk + DPT) so a depth
    # mismatch localizes to trunk vs metric-bins head
    # (zoedepth_nk_v1.py:194: rel_depth, out = self.core(x, ...))
    if hasattr(det.depth_estimator, "core"):
        det.depth_estimator.core.register_forward_hook(rec.hook("zoe_core"))
    sm.clip_visual_extractor.register_forward_hook(rec.hook("clip_tokens"))
    sm.side_adapter_network.register_forward_hook(rec.hook("side_adapter"))
    sm.clip_rec_head.register_forward_hook(rec.hook("rec_mask_embs"))
    sm.highres_side_adaptor_network.register_forward_hook(rec.hook("hsa"))
    sm.occ_decoder.lss_view_transformer.register_forward_hook(
        rec.hook("lift"))
    sm.occ_decoder.register_forward_hook(rec.hook("occ_heads"))
    rec.wrap_method(sm.occ_decoder, "forward_early", "occ_early")
    rec.wrap_method(sm.clip_rec_head, "update_remaining_clip_feats",
                    "rec_update")

    # capture the semantic model's exact inputs + final outputs
    inputs = {}

    def sm_hook(_m, hook_inputs, output):
        images, depth, img_metas, adj_metas = hook_inputs[:4]
        names = ("sensor2egos", "ego2globals", "intrins", "post_rots",
                 "post_trans", "bda")
        inputs["imgs"] = images
        inputs["depth"] = depth
        for n, t in zip(names, img_metas):
            inputs[n] = t
        for i, t in enumerate(adj_metas or []):
            inputs[f"adj_meta_{i}"] = t
        _flatten(output, "outputs#0", rec.store)

    sm.register_forward_hook(sm_hook)

    # also capture the depth tower's raw input (the dav2/zoe-normalized imgs)
    def depth_in_hook(_m, hook_inputs, _output):
        inputs.setdefault("depth_imgs_flat", hook_inputs[0])

    det.depth_estimator.register_forward_hook(depth_in_hook)

    data = None
    for i, d in enumerate(loader):
        if i == args.sample_idx:
            data = d
            break
    if data is None:
        raise SystemExit(f"--sample-idx {args.sample_idx} out of range")

    with torch.no_grad():
        if use_gpu:
            model(return_loss=False, rescale=True, **data)
        else:
            # unwrap DataContainers manually for the CPU path
            def unwrap(v):
                if hasattr(v, "data"):
                    v = v.data
                while isinstance(v, list) and len(v) == 1:
                    v = v[0]
                return v

            kwargs = {k: unwrap(v) for k, v in data.items()}
            img = kwargs.pop("img_inputs")
            metas = kwargs.pop("img_metas")
            det.simple_test(None, [metas] if isinstance(metas, dict)
                            else metas, [img], **{
                                k: [v] for k, v in kwargs.items()})

    os.makedirs(args.out, exist_ok=True)
    in_np = {}
    _flatten(inputs, "in", in_np)
    np.savez(os.path.join(args.out, "inputs.npz"),
             **{k[3:]: v for k, v in in_np.items()})
    np.savez(os.path.join(args.out, "boundaries.npz"), **rec.store)
    manifest = {
        "boundaries": sorted({k.split("#")[0] for k in rec.store}),
        "keys": {k: list(v.shape) for k, v in rec.store.items()},
        "inputs": {k[3:]: list(v.shape) for k, v in in_np.items()},
        "config": os.path.basename(args.config),
        "checkpoint": os.path.basename(args.checkpoint),
        "sample_idx": args.sample_idx,
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {len(rec.store)} boundary arrays + "
          f"{len(in_np)} inputs to {args.out}/")


if __name__ == "__main__":
    main()
