"""Loss tests: torch/numpy oracles for the stage-2 and stage-1 losses.

The numpy oracle re-derives the reference algorithm (per-camera loops,
boolean filtering, group while-loops — occ3d_nuscenes.py:228-523) literally,
to validate the vectorized masked-reduction implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.configs.base import GridConfig, LossConfig
from veon_tpu.nn import text as text_mod
from veon_tpu.train import losses as L

GRID = GridConfig(x=(-4, 4, 2), y=(-4, 4, 2), z=(-1, 3, 2), depth=(1.0, 9.0, 1.0))
RNG = np.random.default_rng(0)


def test_bce_bin_occ_matches_torch():
    torch = pytest.importorskip("torch")
    B, X, Y, Z = 2, 4, 4, 2
    logits = RNG.standard_normal((B, X, Y, Z, 2)).astype(np.float32)
    vs = RNG.integers(0, 18, size=(B, X, Y, Z))
    vs[0, 0, 0, 0] = 255  # ignore
    got = float(L.bce_bin_occ_loss(jnp.asarray(logits), jnp.asarray(vs)))
    target = np.where(vs == 17, 1, 0).astype(np.int64)
    target[vs == 255] = 255
    crit = torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 0.5]), ignore_index=255)
    want = float(crit(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3), torch.from_numpy(target)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ce_sem_occ_matches_torch():
    torch = pytest.importorskip("torch")
    B, X, Y, Z, C = 2, 4, 4, 2, 18
    logits = RNG.standard_normal((B, X, Y, Z, C)).astype(np.float32)
    vs = RNG.integers(0, C, size=(B, X, Y, Z))
    vs[0, 0, 0, 0] = 255  # ignore
    got = float(L.ce_sem_occ_loss(jnp.asarray(logits), jnp.asarray(vs)))
    w = L.balanced_class_weights(C)
    crit = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w), ignore_index=255)
    want = float(crit(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3), torch.from_numpy(vs.astype(np.int64))
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pixel_align_2d_loss():
    B, N, H, W, P, D = 1, 2, 4, 6, 5, 8
    ov = RNG.standard_normal((P + 1, D)).astype(np.float32)
    seg = RNG.standard_normal((B, N, H, W, P)).astype(np.float32)
    # clip_feat exactly equal to the argmax-class embedding -> loss == 0
    idx = seg.argmax(-1)
    clip_feat = ov[:-1][idx]
    got = float(L.pixel_align_2d_loss(jnp.asarray(seg), jnp.asarray(clip_feat), jnp.asarray(ov)))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)
    # orthogonal embeddings -> strictly positive; nearest-resize path covered
    clip_small = jnp.asarray(RNG.standard_normal((B, N, 2, 3, D)).astype(np.float32))
    got2 = float(L.pixel_align_2d_loss(jnp.asarray(seg), clip_small, jnp.asarray(ov)))
    assert got2 > 0.1


def test_silog_matches_formula():
    torch = pytest.importorskip("torch")
    pred = RNG.uniform(0.5, 50, size=(100,)).astype(np.float32)
    gt = RNG.uniform(0.5, 50, size=(100,)).astype(np.float32)
    gt[:10] = 1e5  # invalid
    got = float(L.silog_loss(jnp.asarray(pred), jnp.asarray(gt)))
    tp, tg = torch.from_numpy(pred[10:]), torch.from_numpy(gt[10:])
    g = torch.log(tp + 1e-7) - torch.log(tg + 1e-7)
    want = float(torch.clip(torch.sqrt(torch.var(g, unbiased=False) + 0.15 * g.mean() ** 2), max=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_depth_bin_ce_basic():
    # identical pred and gt -> small loss; far apart -> larger
    gt = np.full((1, 1, 4, 4), 3.3, dtype=np.float32)
    near = L.depth_bin_ce_loss(jnp.asarray(gt), jnp.asarray(gt), GRID)
    far = L.depth_bin_ce_loss(jnp.asarray(gt + 4.0), jnp.asarray(gt), GRID)
    assert float(near) < float(far)


def _loss_inputs(B=1, N=2, C=8):
    nx, ny, nz = GRID.size
    V = nx * ny * nz
    P = 5
    refl = [0, 0, 1, 2, 2]  # 3 classes from 5 prompts
    membership = text_mod.merge_matrix(refl, extra_rows=1)
    feat = RNG.standard_normal((B, nx, ny, nz, C)).astype(np.float32)
    sem2d = RNG.standard_normal((B, N, 6, 10, P)).astype(np.float32)
    vs = RNG.integers(0, 4, size=(B, nx, ny, nz))  # classes 0..2 + free=3
    ovw = RNG.standard_normal((P + 1, C)).astype(np.float32)
    metas = {
        "intrins": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "post_rots": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "post_trans": np.zeros((B, N, 3), np.float32),
        "cam2camego": np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        "camego2global": np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        "lidarego2global": np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)),
    }
    for n in range(N):
        th = n * 2.0
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]], np.float32)
        metas["cam2camego"][:, n, :3, :3] = R
    metas["intrins"][..., 0, 0] = 8.0
    metas["intrins"][..., 1, 1] = 8.0
    metas["intrins"][..., 0, 2] = 12.0
    metas["intrins"][..., 1, 2] = 8.0
    cfg = LossConfig(out_channel=4, empty_idx=3, ov_class_number=2,
                     priority=(2, 1, 3), stage2_start=2, high_conf_thr=0.9)
    image_hw = (24, 20)
    return feat, sem2d, vs, metas, ovw, membership, refl, cfg, image_hw


def _numpy_oracle(feat, sem2d, vs, metas, ovw, refl, cfg, image_hw, epoch):
    """Literal re-derivation of Proj2Dto3DLoss.forward (loops + filters)."""
    B, nx, ny, nz, C = feat.shape
    N = sem2d.shape[1]
    P = sem2d.shape[-1]
    class_num = cfg.out_channel - 1
    V = nx * ny * nz
    prio = np.asarray(cfg.priority, dtype=np.float64)
    centers = L.voxel_centers(GRID).reshape(V, 3)
    featv = feat.reshape(B, V, C).astype(np.float64)
    gt = vs.reshape(B, V)

    def cos(a, b):
        return (a * b).sum(-1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-6
        )

    def grid_sample_bilinear(m, u, v, H, W):
        # m: (h, w, P); normalized coords align_corners=False
        h, w = m.shape[:2]
        fx = ((u / ((W - 1) / 2) - 1) + 1) * w / 2 - 0.5
        fy = ((v / ((H - 1) / 2) - 1) + 1) * h / 2 - 0.5
        x0, y0 = int(np.floor(fx)), int(np.floor(fy))
        out = np.zeros(m.shape[-1])
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                wgt = (1 - abs(fx - xi)) * (1 - abs(fy - yi))
                if 0 <= xi < w and 0 <= yi < h:
                    out += wgt * m[yi, xi]
        return out

    groups = {}
    for i, g in enumerate(refl):
        groups.setdefault(g, []).append(i)

    Himg, Wimg = image_hw
    loss_det_total, loss_soft_total = 0.0, 0.0
    for b in range(B):
        dets, det_ns, softs, soft_ns = [], [], [], []
        for n in range(N):
            cam2img = np.eye(4)
            cam2img[:3, :3] = metas["intrins"][b, n]
            l2c = np.linalg.inv(metas["camego2global"][b, n] @ metas["cam2camego"][b, n]) @ metas["lidarego2global"][b]
            l2i = cam2img @ l2c
            pts = centers @ l2i[:3, :3].T + l2i[:3, 3]
            pim = np.concatenate([pts[:, :2] / pts[:, 2:3], pts[:, 2:3]], 1)
            pim = pim @ metas["post_rots"][b, n].T + metas["post_trans"][b, n]
            sem_valid = (gt[b] < class_num) & (gt[b] >= 0)
            kept = (
                (pim[:, 0] >= 0) & (pim[:, 0] <= Wimg - 1)
                & (pim[:, 1] >= 0) & (pim[:, 1] <= Himg - 1)
                & (pim[:, 2] < GRID.depth[1]) & (pim[:, 2] >= GRID.depth[0]) & sem_valid
            )
            idxs = np.where(kept)[0]
            if len(idxs) == 0:
                continue
            samp = np.stack([
                grid_sample_bilinear(sem2d[b, n], pim[i, 0], pim[i, 1], Himg, Wimg)
                for i in idxs
            ])  # (K, P)
            gts = gt[b][idxs]
            fv = featv[b][idxs]

            restricted = np.zeros(len(idxs), dtype=np.int64)
            for k, g in enumerate(gts):
                sel = groups[g]
                restricted[k] = sel[int(np.argmax(samp[k, sel]))]
            merged_idx = np.zeros(len(idxs), dtype=np.int64)
            for k in range(len(idxs)):
                gm = [samp[k, sel].max() for g_, sel in sorted(groups.items())]
                merged_idx[k] = int(np.argmax(gm))
            raw_idx = np.argmax(samp, axis=1)

            sel_soft = (merged_idx == gts) | (gts >= class_num - cfg.ov_class_number)
            sel_det = ~sel_soft
            if epoch >= cfg.stage2_start:
                dots = fv @ ovw[:-1].T.astype(np.float64)
                pp = np.argmax(dots, axis=1)
                pseudo = ovw[:-1][pp]
                conf = cos(fv, pseudo)
                pred_group = np.array([refl[i] for i in pp])
                high = (conf >= cfg.high_conf_thr) & (prio[pred_group] > prio[merged_idx])
                sel_soft = sel_soft & ~high

            def balanced(sel, cls_idx, tgt_idx, extra):
                if sel.sum() == 0:
                    return None, 0
                le = 1 - cos(ovw[tgt_idx[sel]].astype(np.float64), fv[sel])
                oh = np.eye(class_num)[cls_idx[sel]]
                counts = oh.sum(0)
                exist = counts > 0
                cw = 1 / counts[exist]
                if extra is not None:
                    cw = cw * extra[exist]
                iw = oh[:, exist] @ cw
                return (le * iw).sum() / prio[exist].sum(), int(sel.sum())

            ld, nd = balanced(sel_det, gts, restricted, None)
            if nd:
                dets.append(ld)
                det_ns.append(nd)
            ls, ns = balanced(sel_soft, merged_idx, raw_idx, prio)
            if ns:
                softs.append(ls)
                soft_ns.append(ns)
        if dets:
            tot = max(1.0, sum(det_ns))
            loss_det_total += sum(l * n_ / tot for l, n_ in zip(dets, det_ns))
        if softs:
            tot = max(1.0, sum(soft_ns))
            loss_soft_total += sum(l * n_ / tot for l, n_ in zip(softs, soft_ns))
    return loss_det_total / B, loss_soft_total / B


@pytest.mark.parametrize("epoch", [0, 3])
def test_proj_2d_to_3d_matches_oracle(epoch):
    feat, sem2d, vs, metas, ovw, membership, refl, cfg, image_hw = _loss_inputs()
    got_det, got_soft = L.proj_2d_to_3d_loss(
        jnp.asarray(feat), jnp.asarray(sem2d), jnp.asarray(vs),
        {k: jnp.asarray(v) for k, v in metas.items()}, jnp.asarray(ovw),
        membership, cfg.priority, GRID, image_hw, jnp.asarray(epoch), cfg,
    )
    want_det, want_soft = _numpy_oracle(feat, sem2d, vs, metas, ovw, refl, cfg, image_hw, epoch)
    np.testing.assert_allclose(float(got_det), want_det, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(got_soft), want_soft, rtol=2e-3, atol=1e-5)


def test_occupancy_loss_keys_and_grad():
    feat, sem2d, vs, metas, ovw, membership, refl, cfg, image_hw = _loss_inputs()
    nx, ny, nz = GRID.size
    outputs = {
        "bin_occ": jnp.asarray(RNG.standard_normal((1, nz, ny, nx, 2)).astype(np.float32)),
        "feat_occ": jnp.asarray(feat.transpose(0, 3, 2, 1, 4)),
        "sem_seg_ds": jnp.asarray(sem2d),
    }
    mask_camera = np.ones_like(vs)
    mask_camera[0, 0] = 0

    def total(fo):
        out = dict(outputs)
        out["feat_occ"] = fo
        d = L.occupancy_loss(out, jnp.asarray(vs), jnp.asarray(mask_camera),
                             {k: jnp.asarray(v) for k, v in metas.items()},
                             jnp.asarray(ovw), membership, GRID, image_hw,
                             jnp.asarray(0), cfg)
        return sum(d.values()), d

    (val, d), g = jax.value_and_grad(total, has_aux=True)(outputs["feat_occ"])
    assert set(d) == {"loss_binocc", "loss_featalign_det", "loss_featalign_soft"}
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_depth_bce_loss_prefers_correct():
    rng = np.random.default_rng(3)
    gt = np.zeros((1, 2, 16, 16), np.float32)
    gt[0, :, ::2, ::2] = 3.3
    from veon_tpu.lift.lss import two_hot_depth, min_pool_depth

    good_bins = two_hot_depth(jnp.asarray(np.full((1, 2, 4, 4), 3.3, np.float32)), GRID)
    bad_bins = two_hot_depth(jnp.asarray(np.full((1, 2, 4, 4), 7.7, np.float32)), GRID)
    lg = float(L.depth_bce_loss(good_bins, jnp.asarray(gt), GRID, downsample=4))
    lb = float(L.depth_bce_loss(bad_bins, jnp.asarray(gt), GRID, downsample=4))
    assert lg < lb


def test_lss_precomputed_ranks_match():
    from veon_tpu.lift.lss import LSSLift, two_hot_depth

    lift = LSSLift(grid=GRID, input_size=(16, 16), downsample=4, out_channels=3,
                   ds_feat=(1, 1, 1), impl="scan")
    rng = np.random.default_rng(9)
    B, N = 1, 2
    s2e = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)))
    K = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    K[..., 0, 0] = K[..., 1, 1] = 10.0
    K[..., 0, 2] = 8.0
    K[..., 1, 2] = 4.0
    K = jnp.asarray(K)
    pr = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)))
    pt = jnp.zeros((B, N, 3))
    bda = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 4, 3)).astype(np.float32))
    depth = two_hot_depth(
        jnp.asarray(rng.uniform(1, 8, size=(B, N, 4, 4)).astype(np.float32)), GRID)
    a = lift(feat, depth, s2e, K, pr, pt, bda)
    ranks = lift.precompute_ranks(s2e, K, pr, pt, bda)
    b = lift(feat, depth, s2e, K, pr, pt, bda, ranks=ranks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
