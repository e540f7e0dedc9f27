"""RGB-D preprocessing chain: synthetic .sens fixture -> extractor ->
ScanNetRGBDDataset (reference layout) -> collate.

The fixture is written with SensStream.write (the same binary format the
parser reads — reference SensorData.py), the label zip mirrors ScanNet's
``<scene>_2d-label-filt.zip`` with raw ids remapped via a miniature
``scannetv2-labels.combined.tsv``, and the dataset must deliver depth in
metres, cam2world-inverted extrinsics, axis-aligned poses, and 2D labels in
the 0..19 class space (reference scannet.py:503-511).
"""

import io
import os
import zipfile
import zlib

import numpy as np
import pytest

from ponderv2_tpu.datasets.preprocessing.sensor_data import (
    SensFrame,
    SensStream,
    extract_sens,
    map_label_image,
    read_label_mapping,
)

H, W = 12, 16
N_FRAMES = 4


def _jpeg(rgb):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


@pytest.fixture
def scene_fixture(tmp_path, rng):
    scene = "scene0000_00"
    scan_dir = tmp_path / "scans" / scene
    scan_dir.mkdir(parents=True)

    # ---- .sens stream
    stream = SensStream(
        sensor_name="StructureSensor",
        intrinsic_color=np.eye(4, dtype=np.float32),
        extrinsic_color=np.eye(4, dtype=np.float32),
        intrinsic_depth=np.array(
            [[10.0, 0, W / 2, 0], [0, 10.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        ),
        extrinsic_depth=np.eye(4, dtype=np.float32),
        color_compression="jpeg",
        depth_compression="zlib_ushort",
        color_width=W, color_height=H, depth_width=W, depth_height=H,
        depth_shift=1000.0,
    )
    depths_mm = []
    poses = []
    for i in range(N_FRAMES):
        rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        depth_mm = rng.randint(500, 3000, (H, W)).astype(np.uint16)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * i, 0.2 * i, 1.0]
        depths_mm.append(depth_mm)
        poses.append(pose)
        stream.frames.append(
            SensFrame(pose, i, i, _jpeg(rgb),
                      zlib.compress(depth_mm.tobytes()))
        )
    sens_path = scan_dir / f"{scene}.sens"
    stream.write(str(sens_path))

    # ---- label zip (raw ids) + tsv (raw -> nyu40)
    # raw id 7 -> nyu40 1 (wall, class 0); raw 9 -> nyu40 4 (bed, class 3);
    # raw 3 -> nyu40 40 (otherprop, not in the 20 subset -> -1)
    tsv = tmp_path / "scannetv2-labels.combined.tsv"
    tsv.write_text(
        "id\traw_category\tnyu40id\n7\twall\t1\n9\tbed\t4\n3\tprop\t40\n"
    )
    label_zip = scan_dir / f"{scene}_2d-label-filt.zip"
    raw_labels = []
    with zipfile.ZipFile(label_zip, "w") as zf:
        from PIL import Image

        for i in range(N_FRAMES):
            raw = rng.choice([0, 7, 9, 3], size=(H, W)).astype(np.uint16)
            raw_labels.append(raw)
            buf = io.BytesIO()
            Image.fromarray(raw).save(buf, format="PNG")
            zf.writestr(f"label-filt/{i}.png", buf.getvalue())

    # ---- scene meta with axisAlignment (identity here)
    meta = scan_dir / f"{scene}.txt"
    meta.write_text(
        "axisAlignment = " + " ".join(
            str(v) for v in np.eye(4).reshape(-1)) + "\n"
        "colorHeight = 12\n"
    )

    # ---- scene point cloud .pth
    import torch

    pth_dir = tmp_path / "data" / "train"
    pth_dir.mkdir(parents=True)
    n = 500
    torch.save(
        dict(
            coord=rng.rand(n, 3).astype(np.float32) * 2,
            color=rng.rand(n, 3).astype(np.float32) * 255,
            normal=rng.randn(n, 3).astype(np.float32),
            semantic_gt20=rng.randint(0, 20, (n,)).astype(np.int64),
        ),
        pth_dir / f"{scene}.pth",
    )
    return dict(tmp_path=tmp_path, scene=scene, scan_dir=scan_dir,
                sens_path=sens_path, tsv=tsv, label_zip=label_zip,
                depths_mm=depths_mm, poses=poses, raw_labels=raw_labels,
                meta=meta)


def test_sens_roundtrip_parser(scene_fixture):
    s = SensStream.read(str(scene_fixture["sens_path"]))
    assert len(s.frames) == N_FRAMES
    assert s.depth_shift == 1000.0
    d = s.frames[2].decode_depth(s.depth_compression, H, W)
    np.testing.assert_array_equal(d, scene_fixture["depths_mm"][2])
    c = s.frames[1].decode_color(s.color_compression)
    assert c.shape == (H, W, 3)
    np.testing.assert_allclose(s.frames[3].camera_to_world,
                               scene_fixture["poses"][3], atol=1e-6)


def test_label_mapping(scene_fixture):
    mapping = read_label_mapping(str(scene_fixture["tsv"]))
    assert mapping == {7: 1, 9: 4, 3: 40}
    img = np.array([[7, 9], [3, 0]], np.uint16)
    np.testing.assert_array_equal(map_label_image(img, mapping),
                                  [[1, 4], [40, 0]])


def test_extract_and_dataset_roundtrip(scene_fixture):
    fx = scene_fixture
    out_dir = fx["tmp_path"] / "rgbd" / fx["scene"]
    n = extract_sens(
        str(fx["sens_path"]), str(out_dir), frame_skip=1,
        label_zip=str(fx["label_zip"]), label_map_tsv=str(fx["tsv"]),
        scene_meta_txt=str(fx["meta"]),
    )
    assert n == N_FRAMES
    for sub in ("color", "depth", "pose", "intrinsic", "label"):
        assert (out_dir / sub).is_dir()

    from ponderv2_tpu.datasets import build_dataset
    from ponderv2_tpu.datasets.utils import collate_fn

    ds = build_dataset(dict(
        type="ScanNetRGBDDataset",
        split="train",
        data_root=str(fx["tmp_path"] / "data"),
        rgbd_root=str(fx["tmp_path"] / "rgbd"),
        num_cameras=2,
        render_semantic=True,
        transform=[
            dict(type="CenterShift", apply_z=True, keys=["extrinsic"]),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", return_grid_coord=True),
            dict(type="Collect",
                 keys=("coord", "grid_coord", "segment", "rgb", "depth",
                       "semantic2d", "intrinsic", "extrinsic"),
                 feat_keys=("color", "normal")),
        ],
    ))
    sample = ds[0]
    assert sample["rgb"].shape == (2, H, W, 3)
    assert sample["depth"].shape == (2, H, W)
    # depth in metres (mm fixture values 500..3000 -> 0.5..3.0)
    assert 0.4 < sample["depth"].min() and sample["depth"].max() < 3.1
    assert sample["intrinsic"].shape == (2, 3, 3)
    assert sample["extrinsic"].shape == (2, 4, 4)
    # 2D labels in the 0..19 subset: raw 7->0 (wall), 9->3 (bed), others -1
    labs = np.unique(sample["semantic2d"])
    assert set(labs.tolist()) <= {-1, 0, 3}
    assert (sample["semantic2d"] >= 0).any()
    # extrinsic must invert the (axis-aligned) pose
    batch = collate_fn([sample, ds[0]], point_budget=2048, scene_budget=2)
    assert batch["rgb"].shape[0] == 2


def test_dataset_deterministic_frame_pick(scene_fixture):
    fx = scene_fixture
    out_dir = fx["tmp_path"] / "rgbd" / fx["scene"]
    extract_sens(str(fx["sens_path"]), str(out_dir),
                 scene_meta_txt=str(fx["meta"]))
    from ponderv2_tpu.datasets import build_dataset

    cfg = dict(
        type="ScanNetRGBDDataset", split="train",
        data_root=str(fx["tmp_path"] / "data"),
        rgbd_root=str(fx["tmp_path"] / "rgbd"),
        num_cameras=2, render_semantic=False, transform=[],
    )
    a = build_dataset(dict(cfg))[0]
    b = build_dataset(dict(cfg))[0]
    np.testing.assert_array_equal(a["depth"], b["depth"])
