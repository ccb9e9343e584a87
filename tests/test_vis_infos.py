"""Visualization + info-generation tests (synthetic nuScenes JSON tables)."""

import json
import os
import pickle

import numpy as np

from veon_tpu.utils.vis import (camera_grid, colorize_depth, denormalize_clipsan,
                                semseg_overlay, vis_occ_bev,
                                vis_occ_height_slices, vis_occ_pointcloud)
from veon_tpu.data.create_infos import create_infos
from veon_tpu.data.transforms import normalize_clipsan


def test_colorize_depth_range():
    d = np.linspace(1, 40, 12).reshape(3, 4)
    img = colorize_depth(d)
    assert img.shape == (3, 4, 3) and img.dtype == np.uint8
    assert not np.array_equal(img[0, 0], img[-1, -1])


def test_vis_occ_bev_topmost_class():
    occ = np.full((4, 4, 3), 17, dtype=np.int64)
    occ[1, 2, 0] = 4   # car at z=0
    occ[1, 2, 2] = 7   # pedestrian above -> wins
    img = vis_occ_bev(occ)
    assert img.shape == (4, 4, 3)
    np.testing.assert_array_equal(img[2, 1], [255, 0, 0])  # pedestrian color
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255])  # free

    strip = vis_occ_height_slices(occ)
    assert strip.shape == (4, 12, 3)


def test_vis_occ_pointcloud(tmp_path):
    occ = np.full((4, 4, 3), 17, dtype=np.int64)
    occ[1, 2, 0] = 4
    occ[3, 0, 2] = 7
    ply = str(tmp_path / "occ.ply")
    npy = str(tmp_path / "occ.npy")
    verts = vis_occ_pointcloud(
        occ, grid_range=((-40, 40), (-40, 40), (-1, 5.4)),
        ply_path=ply, npy_path=npy)
    assert verts.shape == (2, 4)
    # voxel (1, 2, 0) center: x = -40 + 1.5*20 = -10, y = 2.5*20 - 40 = 10,
    # z = -1 + 0.5*(6.4/3)
    np.testing.assert_allclose(verts[0], [-10.0, 10.0, -1 + 3.2 / 3, 4.0],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.load(npy), verts)
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply" and "element vertex 2" in lines[2]
    assert len(lines) == 10 + 2  # header(10) + 2 points


def test_semseg_overlay_modes():
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    sem = np.zeros((4, 4), dtype=np.int64)
    sem[2:, 2:] = 3
    mask = semseg_overlay(img, sem, num_classes=18, mode="mask")
    assert mask.shape == (8, 8, 3)
    # both classes render their own (seeded) color, nearest-upsampled 2x
    assert not np.array_equal(mask[0, 0], mask[7, 7])
    np.testing.assert_array_equal(mask[6, 6], mask[7, 7])
    over = semseg_overlay(img, sem, num_classes=18, alpha=0.5)
    np.testing.assert_allclose(
        over[0, 0], (img[0, 0] * 0.5 + mask[0, 0] * 0.5).astype(np.uint8),
        atol=1)


def test_camera_grid_and_denorm_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, size=(8, 10, 3), dtype=np.uint8)
    norm = normalize_clipsan(raw)
    rec = denormalize_clipsan(norm)
    np.testing.assert_allclose(rec, raw, atol=1)
    grid = camera_grid([raw] * 6, cols=3)
    assert grid.shape == (16, 30, 3)


def _write_tables(root, version="v1.0-mini"):
    os.makedirs(os.path.join(root, version), exist_ok=True)

    def dump(name, rows):
        with open(os.path.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)

    cams = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]
    sensors = [{"token": f"sen_{c}", "channel": c, "modality": "camera"} for c in cams]
    sensors.append({"token": "sen_LIDAR", "channel": "LIDAR_TOP", "modality": "lidar"})
    dump("sensor", sensors)
    calibs = [{"token": f"cal_{c}", "sensor_token": f"sen_{c}",
               "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.5],
               "camera_intrinsic": [[100, 0, 80], [0, 100, 45], [0, 0, 1]]}
              for c in cams]
    calibs.append({"token": "cal_LIDAR", "sensor_token": "sen_LIDAR",
                   "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8],
                   "camera_intrinsic": []})
    dump("calibrated_sensor", calibs)
    dump("ego_pose", [{"token": f"ep{i}", "rotation": [1, 0, 0, 0],
                       "translation": [i * 1.0, 0, 0], "timestamp": i} for i in range(4)])
    dump("scene", [{"token": "sceneA", "name": "scene-0001"},
                   {"token": "sceneB", "name": "scene-0002"}])
    samples = [{"token": f"s{i}", "timestamp": i * 10,
                "scene_token": "sceneA" if i < 1 else "sceneB"} for i in range(2)]
    dump("sample", samples)
    sds = []
    for i in range(2):
        sds.append({"token": f"sd_l{i}", "sample_token": f"s{i}", "is_key_frame": True,
                    "calibrated_sensor_token": "cal_LIDAR", "ego_pose_token": f"ep{i}",
                    "filename": f"samples/LIDAR_TOP/l{i}.bin", "timestamp": i * 10})
        for c in cams:
            sds.append({"token": f"sd_{c}{i}", "sample_token": f"s{i}", "is_key_frame": True,
                        "calibrated_sensor_token": f"cal_{c}", "ego_pose_token": f"ep{i}",
                        "filename": f"samples/{c}/img{i}.jpg", "timestamp": i * 10})
    dump("sample_data", sds)


def test_create_infos_cli(tmp_path):
    """`create-infos` subcommand (tools/create_data_bevdet.py counterpart):
    val scenes from a one-per-line file, pickles written to the default
    <data-root>/bevdetv2-nuscenes prefix, loadable by pickle."""
    from veon_tpu.cli.main import main as cli_main

    root = str(tmp_path)
    _write_tables(root)
    scenes_file = os.path.join(root, "val_scenes.txt")
    with open(scenes_file, "w") as f:
        f.write("scene-0002\n\n")
    cli_main(["create-infos", "--data-root", root, "--version", "v1.0-mini",
              "--val-scenes", scenes_file])
    for split, n in (("train", 1), ("val", 1)):
        with open(os.path.join(root,
                               f"bevdetv2-nuscenes_infos_{split}.pkl"), "rb") as f:
            data = pickle.load(f)
        assert len(data["infos"]) == n, (split, data)
    # comma-list form routes the same scene to val
    cli_main(["create-infos", "--data-root", root, "--version", "v1.0-mini",
              "--val-scenes", "scene-0001,scene-0002",
              "--out-prefix", os.path.join(root, "allval")])
    with open(os.path.join(root, "allval_infos_val.pkl"), "rb") as f:
        assert len(pickle.load(f)["infos"]) == 2


def test_create_infos_from_raw_tables(tmp_path):
    root = str(tmp_path)
    _write_tables(root)
    infos = create_infos(root, version="v1.0-mini",
                         val_scene_names=["scene-0002"])
    assert len(infos["train"]) == 1 and len(infos["val"]) == 1
    info = infos["train"][0]
    assert set(info["cams"]) == {"CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                                 "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"}
    assert info["lidar2ego_translation"] == [0, 0, 1.8]
    assert info["occ_path"].endswith(os.path.join("gts", "scene-0001", "s0"))
