"""Torch mirrors of the reference checkpoint layouts, for the whole-model
converter dress rehearsal (tests/test_ckpt_full_convert.py).

Each mirror reproduces the EXACT attribute nesting of the reference model so
that `.state_dict()` emits the same keys a real `SAN_ViT-B.pth` / VEON /
DAV2 dump would contain (after the `semantic_model.model.` prefix strip the
CLI applies via revise_keys). Sources:

- FeatureExtractor / RecWithAttnbiasHead: `mmdet3d/models/semantic_net/
  clip_utils/visual.py:23-155` — NOTE both re-index their sliced ModuleList
  from 0 (torch slicing semantics), so dump keys are `resblocks.0...`
  regardless of the original layer number.
- PredefinedOvClassifier / LearnableBgOvClassifier: `clip_utils/
  classifier.py:11-106` — copies the CLIP model's non-visual children
  (transformer/token_embedding/ln_final) + top-level params
  (positional_embedding/text_projection/logit_scale) + attn_mask buffer.
- RegionwiseSideAdapterNetwork + MLPMaskDecoder: `side_adapter/
  side_adaptor_in_veon.py:31-127`, fusion layers `layers.py:75-108`,
  MLP `layers.py:34-50`.
- HighresSideAdaptorNetwork: `side_adapter/highres_side_adaptor.py:17-282`.
- AlignNetOcc3D (+ temporal fusion): `side_adapter/align_net_occ3d.py`.
- DepthAnythingV2Adaptor: DINOv2 trunk + DPT head
  (`mmdet3d/models/depth_anything_v2/{dinov2.py,dpt.py}`).
"""

from collections import OrderedDict

import numpy as np
import torch
from torch import nn


# ------------------------------------------------------------- open_clip


class _ClipMLP(nn.Sequential):
    def __init__(self, d, hidden):
        super().__init__(OrderedDict([
            ("c_fc", nn.Linear(d, hidden)),
            ("gelu", nn.GELU()),
            ("c_proj", nn.Linear(hidden, d)),
        ]))


class ClipResBlock(nn.Module):
    """open_clip ResidualAttentionBlock (keys: ln_1, attn.in_proj_*,
    attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj)."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = _ClipMLP(d, d * 4)


class ClipVisualTower(nn.Module):
    """open_clip VisionTransformer param surface."""

    def __init__(self, width, heads, layers, patch, grid, out_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width))
        self.positional_embedding = nn.Parameter(
            torch.randn(grid[0] * grid[1] + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [ClipResBlock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, out_dim))


class FeatureExtractorMirror(nn.Module):
    """visual.py:23-56: shallow-trunk wrapper; resblocks is the REINDEXED
    slice [:last_layer_idx]."""

    def __init__(self, visual, last_layer_idx):
        super().__init__()
        self.conv1 = visual.conv1
        self.class_embedding = visual.class_embedding
        self.positional_embedding = visual.positional_embedding
        self.ln_pre = visual.ln_pre
        self.resblocks = nn.ModuleList(
            list(visual.transformer.resblocks[:last_layer_idx]))


class RecHeadMirror(nn.Module):
    """visual.py:113-155: deep-trunk wrapper; resblocks reindexed slice
    [first_layer_idx:] + ln_post + proj."""

    def __init__(self, visual, first_layer_idx):
        super().__init__()
        self.resblocks = nn.ModuleList(
            list(visual.transformer.resblocks[first_layer_idx:]))
        self.ln_post = visual.ln_post
        self.proj = visual.proj


class OvClassifierMirror(nn.Module):
    """classifier.py:11-106 param surface (text side of CLIP + bg_embed)."""

    def __init__(self, width, heads, layers, vocab, context, out_dim):
        super().__init__()
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [ClipResBlock(width, heads) for _ in range(layers)])
        self.token_embedding = nn.Embedding(vocab, width)
        self.ln_final = nn.LayerNorm(width)
        self.positional_embedding = nn.Parameter(torch.randn(context, width))
        self.text_projection = nn.Parameter(torch.randn(width, out_dim))
        self.logit_scale = nn.Parameter(torch.tensor(2.0))
        self.register_buffer("attn_mask", torch.zeros(context, context))
        self.bg_embed = nn.Parameter(torch.randn(1, out_dim))


# ------------------------------------------------------- side adapter ViT


class TimmBlock(nn.Module):
    """timm ViT block (norm1, attn.qkv/proj, norm2, mlp.fc1/fc2)."""

    def __init__(self, d, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, d * 3)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, d * mlp_ratio)
        self.mlp.fc2 = nn.Linear(d * mlp_ratio, d)


class _RefMLP(nn.Module):
    """layers.py:34-50 MLP: ModuleList `layers` of affine_func."""

    def __init__(self, dims, affine):
        super().__init__()
        self.layers = nn.ModuleList(
            [affine(a, b) for a, b in zip(dims[:-1], dims[1:])])


class SideAdapterMirror(nn.Module):
    """side_adaptor_in_veon.py:92-127 + MLPMaskDecoder:31-67."""

    def __init__(self, san):
        super().__init__()
        d = san.side_width
        # the cls row is stripped and cls_token deleted at construction
        # (side_adaptor_in_veon.py:105-108), so dumps carry grid**2 rows
        n_tok = san.side_pretrain_grid[0] * san.side_pretrain_grid[1]
        self.vit_model = nn.Module()
        self.vit_model.patch_embed = nn.Module()
        self.vit_model.patch_embed.proj = nn.Conv2d(
            3, d, san.side_patch_size, stride=san.side_patch_size)
        self.vit_model.pos_embed = nn.Parameter(torch.randn(1, n_tok, d))
        self.vit_model.blocks = nn.ModuleList(
            [TimmBlock(d) for _ in range(san.side_depth)])
        self.query_embed = nn.Parameter(torch.randn(1, san.num_queries, d))
        self.query_pos_embed = nn.Parameter(torch.randn(1, san.num_queries, d))
        # fusion: ModuleDict layer_{side_idx} of Sequential(LN(clip), 1x1)
        self.fusion_layers = nn.ModuleDict({
            f"layer_{blk}": nn.Sequential(OrderedDict([(
                "input_proj", nn.Sequential(
                    nn.LayerNorm(san.clip_width),
                    nn.Conv2d(san.clip_width, d, 1)),
            )]))
            for blk, _clip in san.fusion_map
        })
        mlp_n = san.attn_bias_mlp_num_layers
        mlp_c = san.attn_bias_mlp_channels
        emb = san.attn_bias_embed_channels
        conv1 = lambda a, b: nn.Conv2d(a, b, 1)
        self.mask_decoder = nn.Module()
        self.mask_decoder.query_mlp = _RefMLP(
            [d] + [mlp_c] * (mlp_n - 1) + [emb], nn.Linear)
        self.mask_decoder.pix_mlp = _RefMLP(
            [d] + [mlp_c] * (mlp_n - 1) + [emb], conv1)
        attn_out = emb * san.attn_bias_heads * san.attn_bias_layers
        self.mask_decoder.attn_mlp = _RefMLP(
            [d] + [mlp_c] * (mlp_n - 1) + [attn_out], conv1)
        if san.rescale_attn_bias:
            self.mask_decoder.bias_scaling = nn.Linear(1, 1)


# ---------------------------------------------------------------- HSA


class _ConvBlock(nn.Module):
    """highres_side_adaptor.py:31-53 ConvBlock."""

    def __init__(self, dim, hidden, out=-1):
        super().__init__()
        out = dim if out == -1 else out
        self.conv1 = nn.Conv2d(dim, hidden, 3, padding=1)
        self.ln1 = nn.LayerNorm(hidden)
        self.conv2 = nn.Conv2d(hidden, out, 3, padding=1)
        self.ln2 = nn.LayerNorm(out)


class _FeedForward(nn.Module):
    """highres_side_adaptor.py:17-28 (net.0 LN, net.1 Linear, net.3 Linear)."""

    def __init__(self, dim, hidden, out):
        super().__init__()
        self.net = nn.Sequential(
            nn.LayerNorm(dim), nn.Linear(dim, hidden), nn.GELU(),
            nn.Linear(hidden, out))


class _HsaBlock(nn.Module):
    """highres_side_adaptor.py:109-134 HighresSideAdaptorBlock."""

    def __init__(self, dim, clip_dim, mlp_dim, pre_norm):
        super().__init__()
        self.ff = _ConvBlock(dim, mlp_dim)
        self.neck_add = nn.Linear(clip_dim, dim, bias=False)
        if pre_norm:
            self.pre_norm = nn.LayerNorm(dim)
        self.ln_3 = nn.LayerNorm(dim)
        self.ln_4 = nn.LayerNorm(dim)


class _AttnManipBlock(nn.Module):
    """highres_side_adaptor.py:137-155 AttnManipulateBlock (pre_norm=False)."""

    def __init__(self, hsa):
        super().__init__()
        dim, mlp = hsa.dim, hsa.mlp_dim
        self.ff = _ConvBlock(dim, mlp, mlp)
        attn_out = hsa.manip_attn_layers * hsa.num_heads * hsa.manip_dim_head
        self.head_attn = _FeedForward(mlp, mlp, attn_out)
        self.head_supp = _FeedForward(mlp, mlp, hsa.manip_supp_dim)
        self.ln_3 = nn.LayerNorm(dim)
        self.ln_4 = nn.LayerNorm(mlp)


class HsaMirror(nn.Module):
    """highres_side_adaptor.py:229-282 HighresSideAdaptorNetwork."""

    def __init__(self, hsa):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            3, hsa.dim, hsa.patch_shape, stride=hsa.patch_shape)
        self.hsa_net_body = nn.ModuleList([
            _HsaBlock(hsa.dim, hsa.clip_dim, hsa.mlp_dim, pre_norm=(i == 0))
            for i in range(len(hsa.fusion_map))
        ])
        self.rear_block = _AttnManipBlock(hsa)


# ------------------------------------------------------------ occ decoder


class _ConvModule3d(nn.Module):
    """mmcv ConvModule(Conv3d[, BN3d]) key surface (.conv, .bn)."""

    def __init__(self, cin, cout, k, bias=False, bn=True):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, padding=k // 2, bias=bias)
        if bn:
            self.bn = nn.BatchNorm3d(cout)


class _ResBlock3D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = _ConvModule3d(c, c, 3)
        self.conv2 = _ConvModule3d(c, c, 3)


class _TemporalDeformableMirror(nn.Module):
    """align_net_occ3d.py:88-128."""

    def __init__(self, c, heads=4, samples=8):
        super().__init__()
        self.offset_conv = nn.Sequential(
            nn.Conv3d(c, c, 3, padding=1), nn.GELU(),
            nn.Conv3d(c, heads * samples * 3, 3, padding=1, bias=False),
            nn.Tanh())
        self.key_value_proj = nn.Conv3d(c, c * 2, 1)
        self.query_proj = nn.Conv3d(c, c, 1)
        self.out_proj = nn.Conv3d(c, c, 1)
        self.final_norm = nn.BatchNorm3d(c)


class _TemporalFusionMirror(nn.Module):
    """align_net_occ3d.py:13-86 TemporalFusionMultiFrame."""

    def __init__(self, c, seqs):
        super().__init__()
        self.t_final = _ConvModule3d(c * 3, c, 3)
        self.before_fusion_layer = nn.Module()
        self.before_fusion_layer.offset_conv = _ConvModule3d(c, c, 3)
        self.t_fuse_mid = nn.Module()
        self.t_fuse_mid.t_fuse = nn.ModuleList(
            [_ConvModule3d(c * 2, c, 3) for _ in range(seqs)])
        self.deform_fusion_layer = nn.Module()
        self.deform_fusion_layer.t_deform = _TemporalDeformableMirror(c)


class OccDecoderMirror(nn.Module):
    """align_net_occ3d.py:207-236 AlignNetOcc3D param surface."""

    def __init__(self, prop, hsa_supp_dim, clip_width, num_temporal=1):
        super().__init__()
        c = prop.dim
        # CatFusionLift (layers.py:154-177)
        p1 = c // 4
        self.fusion_layers = nn.ModuleDict({
            "layer_0": nn.Sequential(OrderedDict([
                ("input_proj_1", nn.Sequential(
                    nn.LayerNorm(hsa_supp_dim + clip_width),
                    nn.Conv2d(hsa_supp_dim + clip_width, p1, 1))),
                ("input_proj_2", nn.Sequential(
                    nn.LayerNorm(clip_width), nn.Conv2d(clip_width, c - p1, 1))),
            ]))
        })
        self.layers_3d_body = nn.ModuleList(
            [_ResBlock3D(c) for _ in range(prop.layer_depth)])
        self.occupancy_pred = nn.Module()
        self.occupancy_pred.occ_conv1 = _ConvModule3d(c, c // 4, 1)
        self.occupancy_pred.occ_conv2 = _ConvModule3d(c // 4, 2, 1, bn=False)
        self.feat_pred = nn.Module()
        self.feat_pred.occ_conv1 = _ConvModule3d(c, c, 1, bias=True)
        self.feat_pred.occ_conv2 = _ConvModule3d(c, c, 1)
        self.feat_pred.occ_conv3 = _ConvModule3d(c, prop.clip_proj_dim, 1, bn=False)
        if num_temporal > 1:
            self.temporal_fusion = _TemporalFusionMirror(c, seqs=num_temporal - 1)


# ----------------------------------------------------------------- DAV2


class _DinoBlock(nn.Module):
    """DINOv2 block with LayerScale (norm1, attn.qkv/proj, ls1.gamma,
    norm2, mlp.fc1/fc2, ls2.gamma) + optional LoRA A/B on every linear."""

    def __init__(self, d, lora_r=0, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, d * 3)
        self.attn.proj = nn.Linear(d, d)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.ones(d))
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, d * mlp_ratio)
        self.mlp.fc2 = nn.Linear(d * mlp_ratio, d)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.ones(d))
        if lora_r:
            for lin, cin, cout in ((self.attn.qkv, d, 3 * d),
                                   (self.attn.proj, d, d),
                                   (self.mlp.fc1, d, 4 * d),
                                   (self.mlp.fc2, 4 * d, d)):
                lin.lora_A = nn.Parameter(torch.randn(lora_r, cin) * 0.01)
                lin.lora_B = nn.Parameter(torch.zeros(cout, lora_r))


class Dav2Mirror(nn.Module):
    """DepthAnythingV2 dump layout: pretrained.* (DINOv2) + depth_head.*
    (DPT). lora_r>0 adds the VEON pretrain adapters."""

    def __init__(self, depth_cfg, lora_r=0):
        super().__init__()
        vit = depth_cfg.vit
        d = vit.width
        f = depth_cfg.features
        oc = depth_cfg.out_channels
        self.pretrained = nn.Module()
        self.pretrained.patch_embed = nn.Module()
        self.pretrained.patch_embed.proj = nn.Conv2d(
            3, d, vit.patch_size, stride=vit.patch_size)
        self.pretrained.cls_token = nn.Parameter(torch.randn(1, 1, d))
        n_tok = vit.pretrain_grid[0] * vit.pretrain_grid[1] + 1
        self.pretrained.pos_embed = nn.Parameter(torch.randn(1, n_tok, d))
        self.pretrained.blocks = nn.ModuleList(
            [_DinoBlock(d, lora_r) for _ in range(vit.depth)])
        self.pretrained.norm = nn.LayerNorm(d)

        h = nn.Module()
        self.depth_head = h
        h.projects = nn.ModuleList([nn.Conv2d(d, c, 1) for c in oc])
        h.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, stride=4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1),
        ])
        h.scratch = nn.Module()
        for i, c in enumerate(oc):
            setattr(h.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, f, 3, padding=1, bias=False))
        for i in (1, 2, 3, 4):
            rn = nn.Module()
            for rcu in ("resConfUnit1", "resConfUnit2"):
                m = nn.Module()
                m.conv1 = nn.Conv2d(f, f, 3, padding=1)
                m.conv2 = nn.Conv2d(f, f, 3, padding=1)
                setattr(rn, rcu, m)
            rn.out_conv = nn.Conv2d(f, f, 1)
            setattr(h.scratch, f"refinenet{i}", rn)
        h.scratch.output_conv1 = nn.Conv2d(f, f // 2, 3, padding=1)
        h.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.Sigmoid())


# ---------------------------------------------------------------- builders


def _np_sd(mod: nn.Module) -> dict:
    torch.manual_seed(0)
    for p in mod.parameters():
        with torch.no_grad():
            p.normal_(0, 0.02)
    return {k: v.detach().numpy().astype(np.float32)
            for k, v in mod.state_dict().items()}


def make_san_semantic_sd(cfg, num_temporal: int = 1) -> dict:
    """Full SANInVeonTemporal semantic checkpoint (keys as after the
    `semantic_model.model.` revise_keys strip)."""
    san = cfg.san
    visual = ClipVisualTower(san.clip_width, san.clip_heads, san.clip_layers,
                             san.clip_patch_size, san.clip_pretrain_grid,
                             san.clip_embed_dim)
    root = nn.Module()
    root.clip_visual_extractor = FeatureExtractorMirror(
        visual, san.feature_last_layer_idx)
    root.clip_rec_head = RecHeadMirror(visual, san.feature_last_layer_idx)
    root.side_adapter_network = SideAdapterMirror(san)
    root.highres_side_adaptor_network = HsaMirror(cfg.hsa)
    root.ov_classifier = OvClassifierMirror(
        san.text_width, san.text_heads, san.text_layers, san.text_vocab_size,
        san.text_context_length, san.clip_embed_dim)
    root.occ_decoder = OccDecoderMirror(
        cfg.propagation, cfg.hsa.manip_supp_dim, san.clip_width,
        num_temporal=num_temporal)
    return _np_sd(root)


def make_dav2_sd(depth_cfg, lora_r: int = 0) -> dict:
    return _np_sd(Dav2Mirror(depth_cfg, lora_r=lora_r))


# ------------------------------------------------------------- ZoeDepth-NK


class _BeitBlock(nn.Module):
    """timm BEiT block as dumped by the VEON ZoeDepth adaptor
    (`depth_midas/zoedepth/zoedepth_nk_v1.py` + midas backbones/beit.py):
    qkv bias-free Linear with separate q_bias/v_bias params, relative
    position bias table (pretrain window 24x24 -> (2*24-1)^2+3 rows),
    LayerScale gamma_1/2, optional LoRA on qkv."""

    def __init__(self, d, heads, lora_r=0):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, d * 3, bias=False)
        self.attn.q_bias = nn.Parameter(torch.zeros(d))
        self.attn.v_bias = nn.Parameter(torch.zeros(d))
        M = (2 * 24 - 1) ** 2 + 3
        self.attn.relative_position_bias_table = nn.Parameter(
            torch.zeros(M, heads))
        self.attn.register_buffer(
            "relative_position_index", torch.zeros(1, dtype=torch.long))
        self.attn.proj = nn.Linear(d, d)
        self.gamma_1 = nn.Parameter(torch.ones(d))
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.gamma_2 = nn.Parameter(torch.ones(d))
        if lora_r:
            self.attn.qkv.lora_A = nn.Parameter(torch.randn(lora_r, d) * 0.01)
            self.attn.qkv.lora_B = nn.Parameter(torch.zeros(3 * d, lora_r))


class _LoraProject(nn.Module):
    """MiDaS readout: act_postprocessN.0.project = Sequential(Linear, GELU),
    with LoRA injected on the Linear by the VEON adaptor."""

    def __init__(self, d, lora_r=0):
        super().__init__()
        lin = nn.Linear(2 * d, d)
        if lora_r:
            lin.lora_A = nn.Parameter(torch.randn(lora_r, 2 * d) * 0.01)
            lin.lora_B = nn.Parameter(torch.zeros(d, lora_r))
        self.project = nn.Sequential(lin, nn.GELU())


class ZoeMirror(nn.Module):
    """VEON ZoeDepth-NK adaptor dump layout (kitti-only bin_conf — the
    adaptor comments out the nyu branch and the patch-transformer router,
    zoedepth_nk_v1.py:89-115)."""

    def __init__(self, zc, lora_r=0):
        super().__init__()
        d, f = zc.width, zc.features
        pc = zc.pyramid_channels
        model = nn.Module()
        model.patch_embed = nn.Module()
        model.patch_embed.proj = nn.Conv2d(3, d, zc.patch_size,
                                           stride=zc.patch_size)
        model.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        model.blocks = nn.ModuleList(
            [_BeitBlock(d, zc.heads, lora_r) for _ in range(zc.depth)])

        pretrained = nn.Module()
        pretrained.model = model
        for i in range(4):
            ap = nn.Sequential(
                _LoraProject(d, lora_r), nn.Identity(), nn.Identity(),
                nn.Conv2d(d, pc[i], 1))
            if i == 0:
                ap.append(nn.ConvTranspose2d(pc[i], pc[i], 4, stride=4))
            elif i == 1:
                ap.append(nn.ConvTranspose2d(pc[i], pc[i], 2, stride=2))
            elif i == 3:
                ap.append(nn.Conv2d(pc[i], pc[i], 3, stride=2, padding=1))
            setattr(pretrained, f"act_postprocess{i + 1}", ap)

        scratch = nn.Module()
        for i, c in enumerate(pc):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, f, 3, padding=1, bias=False))
        for i in (1, 2, 3, 4):
            rn = nn.Module()
            for rcu in ("resConfUnit1", "resConfUnit2"):
                m = nn.Module()
                m.conv1 = nn.Conv2d(f, f, 3, padding=1)
                m.conv2 = nn.Conv2d(f, f, 3, padding=1)
                setattr(rn, rcu, m)
            rn.out_conv = nn.Conv2d(f, f, 1)
            setattr(scratch, f"refinenet{i}", rn)
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, padding=1), nn.Identity(),
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU())

        core_inner = nn.Module()
        core_inner.pretrained = pretrained
        core_inner.scratch = scratch
        core = nn.Module()
        core.core = core_inner
        self.core = core

        # bins-head dims (zoedepth_nk_v1.py:105-168): conv2 f->f; seed /
        # projector MLPs at mlp_dim = bin_embedding_dim // 2; attractors at
        # mlp_dim = bin_embedding_dim; CLB bottleneck (32+e)//4 -> 4
        self.conv2 = nn.Conv2d(f, f, 1)

        def conv_mlp(cin, mid, cout):
            return nn.Sequential(nn.Conv2d(cin, mid, 1), nn.ReLU(),
                                 nn.Conv2d(mid, cout, 1))

        class _Net(nn.Module):
            def __init__(self, cin, mid, cout):
                super().__init__()
                self._net = conv_mlp(cin, mid, cout)

        e = zc.bin_embedding_dim
        self.seed_bin_regressors = nn.ModuleDict(
            {"kitti": _Net(f, e // 2, zc.n_bins)})
        self.seed_projector = _Net(f, e // 2, e)
        self.projectors = nn.ModuleList(
            [_Net(f, e // 2, e) for _ in range(4)])
        self.attractors = nn.ModuleDict({"kitti": nn.ModuleList(
            [_Net(e, e, n) for n in zc.n_attractors])})
        clb = nn.Module()
        clb.mlp = conv_mlp(32 + e, (32 + e) // 4, 4)
        self.conditional_log_binomial = nn.ModuleDict({"kitti": clb})


def make_zoedepth_sd(zoe_cfg, lora_r: int = 0) -> dict:
    return _np_sd(ZoeMirror(zoe_cfg, lora_r=lora_r))
