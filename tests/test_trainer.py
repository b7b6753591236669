"""Trainer orchestrator integration: train 2 epochs on a synthetic on-disk
KITTI tree, checkpoint, resume, and evaluate-protocol smoke."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from movedepth_tpu.config import Config
from movedepth_tpu.train.trainer import Trainer
from movedepth_tpu.train import checkpoints as C


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("kitti")
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        small = rng.uniform(0, 255, (8, 12, 3))
        arr = np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    splits = tmp_path / "splits" / "tiny"
    splits.mkdir(parents=True)
    train_lines = [f"{drive} {i} l" for i in range(1, 6)]
    val_lines = [f"{drive} 6 l"]
    (splits / "train_files.txt").write_text("\n".join(train_lines))
    (splits / "val_files.txt").write_text("\n".join(val_lines))
    return tmp_path, str(splits)


def make_cfg(tmp_path):
    return Config(
        data_path=str(tmp_path), log_dir=str(tmp_path / "log"),
        model_name="t", split="tiny", height=64, width=96, batch_size=2,
        num_depth_bins=8, num_epochs=2, num_workers=2, log_frequency=2,
        compute_dtype="float32", seed=0,
    )


@pytest.mark.slow
def test_trainer_end_to_end(kitti_tree):
    tmp_path, splits = kitti_tree
    cfg = make_cfg(tmp_path).replace(save_intermediate_models=True)
    trainer = Trainer(cfg, split_dir=splits)
    assert len(trainer.train_loader) == 2  # 5 samples, batch 2, drop_last
    trainer.train()
    assert int(trainer.state.step) == 4  # 2 epochs x 2 steps

    models_dir = os.path.join(trainer.log_path, "models")
    assert os.path.isfile(os.path.join(models_dir, "opt.json"))
    cfg2 = Config.from_json(open(os.path.join(models_dir, "opt.json")).read())
    assert cfg2.height == 64
    assert os.path.isdir(os.path.join(models_dir, "last"))
    assert os.path.isdir(os.path.join(models_dir, "weights_0"))
    # per-step snapshot at the late phase (step % 2000 == 0 -> step 0;
    # reference: trainer.py:291-292)
    assert os.path.isdir(os.path.join(models_dir, "weights_0_0"))


@pytest.mark.slow
def test_trainer_multistep_epoch(kitti_tree):
    """steps_per_dispatch=2: the scanned multi-batch dispatch covers a
    full epoch (2 steps = 1 group of K=2, no tail), keeps the step
    accounting identical to the sequential loop, and still emits the
    per-step snapshot dirs (state.py::make_train_multistep)."""
    tmp_path, splits = kitti_tree
    cfg = make_cfg(tmp_path).replace(
        model_name="t_multi", steps_per_dispatch=2,
        save_intermediate_models=True)
    trainer = Trainer(cfg, split_dir=splits)
    assert len(trainer.train_loader) == 2
    trainer.train()
    assert int(trainer.state.step) == 4  # 2 epochs x 2 steps
    models_dir = os.path.join(trainer.log_path, "models")
    assert os.path.isdir(os.path.join(models_dir, "last"))
    # step 0 hits the %2000 snapshot cadence inside the first group
    assert os.path.isdir(os.path.join(models_dir, "weights_0_0"))
    p = np.asarray(trainer.state.params["mono_encoder"]["conv1"]["kernel"])
    assert np.isfinite(p).all()


@pytest.mark.slow
def test_trainer_resume_from_checkpoint(kitti_tree):
    """Resume continues the epoch clock: a state saved after 2 epochs
    (step 4) restored into a 4-epoch run trains epochs 2..3 only, keeps
    the z-bin schedule epoch-accurate, and numbers checkpoints from
    where the saved run left off (the reference restarts at epoch 0,
    movedepth/trainer.py:250)."""
    tmp_path, splits = kitti_tree
    cfg = make_cfg(tmp_path)
    last = os.path.join(str(tmp_path / "log"), "t", "models", "last")
    cfg = cfg.replace(load_weights_folder=last, model_name="t2",
                      num_epochs=4, ztrans_start_epc=2, save_frequency=1)
    trainer = Trainer(cfg, split_dir=splits)
    assert int(trainer.state.step) == 4  # restored optimizer step
    assert trainer.step == 4

    seen_use_z = []
    orig_step = trainer.train_step

    def spy(state, batch, rng, use_z):
        seen_use_z.append(bool(use_z))
        return orig_step(state, batch, rng, use_z)

    trainer.train_step = spy
    trainer.train()
    assert int(trainer.state.step) == 8  # 2 more epochs x 2 steps
    assert trainer.epoch == 3
    # epoch 2: use_z False (2 > ztrans_start_epc=2 is False); epoch 3: True
    assert seen_use_z == [False, False, True, True]
    models_dir = os.path.join(trainer.log_path, "models")
    assert os.path.isdir(os.path.join(models_dir, "weights_2"))
    assert os.path.isdir(os.path.join(models_dir, "weights_3"))
    assert not os.path.isdir(os.path.join(models_dir, "weights_0"))


def test_trainer_mono_warm_start(kitti_tree):
    tmp_path, splits = kitti_tree
    cfg = make_cfg(tmp_path)
    # Self-sufficient donor checkpoint (must not depend on the slow-marked
    # end-to-end test having run first): a DIFFERENT-seed init, saved the
    # way Trainer.save does, guarantees the warm start is non-vacuous
    # (same-seed init would match the target trainer's params trivially).
    donor_log = os.path.join(str(tmp_path / "log"), "t_donor")
    donor = Trainer(cfg.replace(model_name="t_donor", seed=123),
                    split_dir=splits)
    C.save_checkpoint(donor_log, donor.state, last=True)
    last = os.path.join(donor_log, "models", "last")
    cfg = cfg.replace(mono_weights_folder=last, model_name="t3")
    trainer = Trainer(cfg, split_dir=splits)
    restored = C.restore_checkpoint(
        last, trainer.state)  # full reference state
    a = np.asarray(
        trainer.state.params["mono_encoder"]["conv1"]["kernel"])
    b = np.asarray(restored.params["mono_encoder"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # BN running stats must come along with the params (reference restores
    # full per-model state dicts, trainer.py:833-844)
    for leaf in ("mean", "var"):
        sa = np.asarray(
            trainer.state.batch_stats["mono_encoder"]["bn1"][leaf])
        sb = np.asarray(restored.batch_stats["mono_encoder"]["bn1"][leaf])
        np.testing.assert_array_equal(sa, sb)
    assert int(trainer.state.step) == 0  # optimizer NOT restored


def test_trainer_imagenet_init(kitti_tree, tmp_path, monkeypatch):
    """weights_init='pretrained' loads a torchvision-layout .pth into the
    mono + pose encoders (reference: trainer.py:67,84;
    networks/resnet_encoder.py:59-104)."""
    import torch

    from tests.test_torch_import import TorchResNet18Encoder
    from movedepth_tpu.train import torch_import as TI

    torch.manual_seed(3)
    enc = TorchResNet18Encoder(num_input_images=1)
    # torchvision dicts have no 'encoder.' prefix and carry fc.* heads
    sd = {k[len("encoder."):]: v for k, v in enc.state_dict().items()}
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    pdir = tmp_path / "pretrain_resnet"
    pdir.mkdir()
    torch.save(sd, pdir / "resnet18-synthetic.pth")
    monkeypatch.setenv("PRETRAIN_RESNET_DIR", str(pdir))

    data_path, splits = kitti_tree
    cfg = make_cfg(data_path).replace(model_name="t_imagenet",
                                      weights_init="pretrained")
    trainer = Trainer(cfg, split_dir=splits)
    want = TI.convert_resnet_encoder(
        {k: v.numpy() for k, v in sd.items()})
    got = np.asarray(trainer.state.params["mono_encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, np.asarray(want["params"]["conv1"]["kernel"]), rtol=1e-6)
    got_bn = np.asarray(
        trainer.state.batch_stats["mono_encoder"]["bn1"]["mean"])
    np.testing.assert_allclose(
        got_bn, np.asarray(want["batch_stats"]["bn1"]["mean"]), rtol=1e-6)
    # pose encoder conv1: tiled over 2 stacked frames and halved
    pose_k = np.asarray(
        trainer.state.params["pose_encoder"]["conv1"]["kernel"])
    mono_k = np.asarray(want["params"]["conv1"]["kernel"])
    assert pose_k.shape[2] == 6
    np.testing.assert_allclose(pose_k[:, :, :3], mono_k / 2, rtol=1e-6)
    np.testing.assert_allclose(pose_k[:, :, 3:], mono_k / 2, rtol=1e-6)


def test_trainer_scratch_init_unchanged(kitti_tree, monkeypatch):
    """weights_init='scratch' must not consult pretrain_resnet at all."""
    from movedepth_tpu.train import torch_import as TI

    def boom(*a, **k):
        raise AssertionError("scratch init must not look for weights")

    monkeypatch.setattr(TI, "load_imagenet_encoders", boom)
    monkeypatch.setattr("movedepth_tpu.train.trainer.load_imagenet_encoders",
                        boom)
    data_path, splits = kitti_tree
    cfg = make_cfg(data_path).replace(model_name="t_scratch",
                                      weights_init="scratch")
    Trainer(cfg, split_dir=splits)
