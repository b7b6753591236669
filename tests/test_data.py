"""Data layer tests: sampler sharding semantics, KITTI dataset end-to-end on
a synthetic on-disk KITTI tree, velodyne GT projection."""

import os

import numpy as np
import pytest
from PIL import Image

from movedepth_tpu.data.loader import ShardedIndexSampler, Loader, collate
from movedepth_tpu.data.kitti import KITTIRawDataset
from movedepth_tpu.data import kitti_utils as KU


def test_sampler_strided_sharding():
    """Val-sampler semantics: indices[rank::world], epoch-seeded shuffle
    (reference: movedepth/utils.py:73-87)."""
    s0 = ShardedIndexSampler(20, 2, rank=0, world_size=2, shuffle=False,
                             drop_last=False)
    s1 = ShardedIndexSampler(20, 2, rank=1, world_size=2, shuffle=False,
                             drop_last=False)
    i0, i1 = s0.epoch_indices(0), s1.epoch_indices(0)
    assert set(i0) | set(i1) == set(range(20))
    assert set(i0) & set(i1) == set()
    np.testing.assert_array_equal(i0, np.arange(0, 20, 2))


def test_sampler_epoch_seeded_shuffle():
    s = ShardedIndexSampler(100, 4, shuffle=True, seed=7)
    a = s.epoch_indices(0)
    b = s.epoch_indices(0)
    c = s.epoch_indices(1)
    np.testing.assert_array_equal(a, b)  # deterministic per epoch
    assert not np.array_equal(a, c)      # reshuffled across epochs
    assert len(a) % 4 == 0               # drop_last


def test_collate():
    samples = [{"x": np.ones((2, 3)), "y": np.zeros(4)} for _ in range(3)]
    out = collate(samples)
    assert out["x"].shape == (3, 2, 3) and out["y"].shape == (3, 4)


# ------------------------------------------------- synthetic KITTI tree

CALIB_CAM = """S_rect_02: 6.0 4.0
R_rect_00: 1 0 0 0 1 0 0 0 1
P_rect_02: 2.0 0 3.0 0 0 2.0 2.0 0 0 0 1 0
"""
# velo (x fwd, y left, z up) -> cam (x right, y down, z fwd)
CALIB_VELO = """R: 0 -1 0 0 0 -1 1 0 0
T: 0 0 0
"""


@pytest.fixture
def kitti_tree(tmp_path):
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    (tmp_path / "2011_09_26" / "calib_cam_to_cam.txt").write_text(CALIB_CAM)
    (tmp_path / "2011_09_26" / "calib_velo_to_cam.txt").write_text(CALIB_VELO)
    velo_dir = tmp_path / drive / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    pts = np.array([[10.0, 0.0, 0.0, 1.0], [5.0, -2.0, -1.0, 1.0]],
                   np.float32)
    for i in range(4):
        pts.tofile(velo_dir / f"{i:010d}.bin")
    return tmp_path, drive


def test_kitti_dataset_sample_layout(kitti_tree):
    root, drive = kitti_tree
    files = [f"{drive} 1 l", f"{drive} 2 l"]
    ds = KITTIRawDataset(str(root), files, 64, 96, (0, -1, 1),
                         is_train=True, img_ext=".jpg")
    s = ds[0]
    assert s["color"].shape == (3, 64, 96, 3)
    assert s["color_aug"].shape == (3, 64, 96, 3)
    for sc in (1, 2, 3):
        assert s[f"color_pyr_{sc}"].shape == (64 // 2 ** sc, 96 // 2 ** sc, 3)
    assert s["K"].shape == (4, 4)
    np.testing.assert_allclose(s["K"][0, 0], 0.58 * 96, rtol=1e-6)
    assert s["color"].dtype == np.float32
    assert 0 <= s["color"].min() and s["color"].max() <= 1
    assert "depth_gt" in s and s["depth_gt"].shape == (375, 1242)


def test_kitti_dataset_missing_frame_fallback(kitti_tree):
    """Edge frames duplicate their neighbor
    (reference: mono_dataset.py:193-204)."""
    root, drive = kitti_tree
    ds = KITTIRawDataset(str(root), [f"{drive} 0 l"], 64, 96, (0, -1, 1),
                         is_train=False, img_ext=".jpg", load_depth=False)
    s = ds[0]  # frame -1 missing -> duplicates frame 0
    np.testing.assert_array_equal(s["color"][1], s["color"][0])


def test_kitti_dataset_deterministic_rng(kitti_tree):
    root, drive = kitti_tree
    files = [f"{drive} 1 l"]
    ds = KITTIRawDataset(str(root), files, 64, 96, (0, -1, 1),
                         is_train=True, img_ext=".jpg", load_depth=False,
                         seed=3)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["color_aug"], b["color_aug"])
    # some epoch draws a different augmentation (flip and/or jitter)
    changed = False
    for e in range(1, 8):
        ds.set_epoch(e)
        c = ds[0]
        if (not np.array_equal(a["color_aug"], c["color_aug"])
                or not np.array_equal(a["color"], c["color"])):
            changed = True
            break
    assert changed


def test_loader_iteration(kitti_tree):
    root, drive = kitti_tree
    files = [f"{drive} 1 l", f"{drive} 2 l"]
    ds = KITTIRawDataset(str(root), files, 64, 96, (0, -1, 1),
                         is_train=False, img_ext=".jpg", load_depth=False)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    assert batches[0]["color"].shape == (2, 3, 64, 96, 3)


def test_generate_depth_map(kitti_tree):
    root, drive = kitti_tree
    depth = KU.generate_depth_map(
        str(root / "2011_09_26"),
        str(root / drive / "velodyne_points" / "data" / "0000000001.bin"),
        cam=2)
    # velo (10,0,0) -> cam (0,0,10): pix (3,2), round-1 -> (1,2), depth 10
    # velo (5,-2,-1) -> cam (2,1,5): pix (3.8,2.4), round-1 -> (1,3), depth 5
    assert depth.shape == (4, 6)
    assert depth[1, 2] == pytest.approx(10.0)
    assert depth[1, 3] == pytest.approx(5.0)


def test_load_odometry_poses(tmp_path):
    rows = np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])]).reshape(-1)
    f = tmp_path / "00.txt"
    np.savetxt(f, np.stack([rows, rows]))
    poses = KU.load_odometry_poses(str(f))
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[0, :3, 3], [1, 2, 3])
    np.testing.assert_allclose(poses[0, 3], [0, 0, 0, 1])


def test_bundled_split_lists():
    """The KITTI split lists ship inside the package (gzipped; reference
    bundles them plain at movedepth/splits/)."""
    import movedepth_tpu
    from movedepth_tpu.data.kitti import readlines

    base = os.path.join(os.path.dirname(movedepth_tpu.__file__), "splits")
    eigen_zhou = readlines(os.path.join(base, "eigen_zhou",
                                        "train_files.txt"))
    assert len(eigen_zhou) == 39810
    assert len(readlines(os.path.join(base, "eigen_zhou",
                                      "val_files.txt"))) == 4424
    eigen = readlines(os.path.join(base, "eigen", "test_files.txt"))
    assert len(eigen) == 697
    # well-formed "<folder> <index> <side>" lines
    folder, idx, side = eigen_zhou[0].split()
    assert side in ("l", "r") and idx.isdigit()
    for split in ("eigen_benchmark", "eigen_full", "odom", "benchmark",
                  "monorec"):
        assert os.path.isdir(os.path.join(base, split))


# ------------------------------------------------- multi-host sharding

class _IndexDataset:
    """Map-style dataset whose samples carry their own index, so a Loader's
    epoch stream reveals exactly which global indices this rank consumed."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray(i)}


def _epoch_order(loader, epoch):
    return np.concatenate([b["idx"] for b in loader.epoch(epoch)])


def test_multihost_loader_sharding():
    """The DistributedSampler contract at the Loader level (reference:
    movedepth/utils.py:73-87): per-epoch rank index sets are disjoint,
    cover the dataset, are epoch-seeded deterministic across independent
    Loader constructions, and interleave one global epoch permutation."""
    n = 37
    make = lambda rank: Loader(_IndexDataset(n), batch_size=4, rank=rank,
                               world_size=2, shuffle=True, drop_last=False,
                               num_workers=2, seed=3)
    l0, l1 = make(0), make(1)
    for epoch in (0, 1):
        i0, i1 = _epoch_order(l0, epoch), _epoch_order(l1, epoch)
        assert set(i0.tolist()) & set(i1.tolist()) == set()
        assert set(i0.tolist()) | set(i1.tolist()) == set(range(n))
        # both ranks stride ONE shared global permutation (rank k takes
        # perm[k::world]) -- the property that makes per-host loaders
        # equivalent to a single global sampler
        perm = np.empty(n, dtype=i0.dtype)
        perm[0::2], perm[1::2] = i0, i1
        assert sorted(perm.tolist()) == list(range(n))
    # deterministic: a freshly constructed Loader replays the same epoch
    np.testing.assert_array_equal(_epoch_order(make(0), 0),
                                  _epoch_order(l0, 0))
    # reshuffled across epochs
    assert not np.array_equal(_epoch_order(l0, 0), _epoch_order(l0, 1))


def test_multihost_loader_drop_last():
    """Train-loader semantics: drop_last trims each RANK's stream to whole
    batches independently (reference torch DataLoader drop_last=True over
    the rank shard)."""
    n, bs = 11, 2  # rank 0 gets 6 -> 3 batches; rank 1 gets 5 -> 2 batches
    l0 = Loader(_IndexDataset(n), batch_size=bs, rank=0, world_size=2,
                shuffle=False, drop_last=True, num_workers=2)
    l1 = Loader(_IndexDataset(n), batch_size=bs, rank=1, world_size=2,
                shuffle=False, drop_last=True, num_workers=2)
    assert len(l0) == 3 and len(l1) == 2
    assert len(list(l0.epoch(0))) == 3
    assert len(list(l1.epoch(0))) == 2


def test_initialize_distributed_plumbing(monkeypatch):
    """initialize_distributed forwards its arguments to
    jax.distributed.initialize and returns (process_index, process_count)
    (the torch.distributed.launch equivalent; reference:
    train_movedepth.sh:15, trainer.py:48-49)."""
    import jax
    from movedepth_tpu.parallel.mesh import initialize_distributed

    seen = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        seen.update(coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    monkeypatch.setattr(jax, "process_count", lambda: 8)
    rank, world = initialize_distributed("10.0.0.1:1234", 8, 3)
    assert seen == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 8, "process_id": 3}
    assert (rank, world) == (3, 8)
