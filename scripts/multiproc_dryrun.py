"""True 2-process data-parallel dryrun (the torch.distributed.launch regime).

The reference's actual launch mode is N OS processes, one per accelerator,
with rank-gated logging/saving and a rank-sharded sampler
(reference: train_movedepth.sh:15, movedepth/utils.py:51-87,
trainer.py:62,149,225). All prior multi-device evidence here was ONE
process with 8 virtual devices; this script runs the real thing on this
box: 2 localhost processes x 4 virtual CPU devices each, one global
(data=4, model=2) mesh, driving the production ``Trainer`` end to end
(gloo cross-process collectives), and asserts the multi-process contracts:

  * ``initialize_distributed`` wires 2 processes / 8 global devices;
  * loader shards are disjoint per process (``ShardedIndexSampler``);
  * per-step losses are identical across ranks (GSPMD all-reduce);
  * exactly one process writes checkpoints (``weights_0``/``last`` appear
    once) and tensorboard events (one events file per writer dir).

Usage:
  python scripts/multiproc_dryrun.py            # parent: spawn + assert
  python scripts/multiproc_dryrun.py child R W PORT DIR   # internal

The parent is jax-free (it only orchestrates and asserts); each child owns
its private 4-device CPU backend. Writes artifacts/multiproc_dryrun.json.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
WORLD = 2
DRIVE = "2011_09_26/2011_09_26_drive_0001_sync"


# --------------------------------------------------------------------- child

def child(rank: int, world: int, port: int, workdir: str):
    sys.path.insert(0, REPO)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from movedepth_tpu.config import Config
    from movedepth_tpu.parallel import mesh as M
    from movedepth_tpu.train.trainer import Trainer

    pid, wc = M.initialize_distributed(f"127.0.0.1:{port}", world, rank)
    assert (pid, wc) == (rank, world), (pid, wc)
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * world, jax.devices()

    mesh = M.make_mesh(model=2)  # (data=4, model=2) across both processes
    assert M.is_multiprocess(mesh)

    cfg = Config(
        data_path=os.path.join(workdir, "kitti"),
        log_dir=os.path.join(workdir, "log"), model_name="mp",
        split="tiny", height=32, width=64, batch_size=2, num_depth_bins=8,
        num_epochs=1, num_workers=2, log_frequency=1,
        compute_dtype="float32", seed=0, native_loader=False,
    )
    trainer = Trainer(cfg, split_dir=os.path.join(workdir, "kitti", "splits",
                                                  "tiny"),
                      mesh=mesh, rank=pid, world_size=wc)

    # rank-gated logging is structural: rank!=0 must not even open writers
    if rank != 0:
        assert not trainer.logger.writers and trainer.logger._jsonl is None

    # AOT-compile BOTH programs before the first cross-process collective:
    # the gloo context rendezvous has a hard 30 s timeout, and two ranks
    # compiling a multi-minute program on one shared core arrive
    # arbitrarily staggered. Compile first (no collectives), then meet at
    # a coordination-service barrier (long timeout, no gloo), then
    # execute -- from there the ranks run the same programs in lockstep.
    import jax.numpy as jnp
    from movedepth_tpu.data.loader import ShardedIndexSampler, collate
    from movedepth_tpu.train import state as S

    def barrier(name, timeout_ms=900_000):
        from jax._src import distributed as jdist
        client = jdist.global_state.client
        client.key_value_set(f"{name}/{rank}", "ok")
        for r in range(world):
            client.blocking_key_value_get(f"{name}/{r}", timeout_ms)

    tb = collate([trainer.train_dataset[int(i)]
                  for i in trainer.train_loader.sampler.batches(0)[0]])
    vb = collate([trainer.val_dataset[int(i)]
                  for i in trainer.val_loader.sampler.batches(0)[0]])
    use_z0 = M.replicate(jnp.asarray(False), mesh)
    sub0 = M.replicate(jax.random.PRNGKey(0), mesh)
    variables = S.combine_variables(trainer.state.params,
                                    trainer.state.batch_stats)
    with M.activate_mesh(mesh):
        trainer.train_step.lower(trainer.state, trainer._put(tb), sub0,
                                 use_z0).compile()
        trainer._val_forward.lower(variables, trainer._put(vb), sub0,
                                   use_z0).compile()
    print(f"child rank {rank}: programs compiled", flush=True)
    barrier("compiled")

    losses = []
    orig_step = trainer.train_step

    def spy(state, batch, rng, use_z):
        state, ls, outs = orig_step(state, batch, rng, use_z)
        losses.append(float(M.local_array(ls["loss"])))
        return state, ls, outs

    trainer.train_step = spy
    with M.activate_mesh(mesh):
        trainer.train()
    barrier("trained")

    record = {
        "rank": rank, "world": wc,
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh": {"data": 4, "model": 2},
        "indices_epoch0":
            trainer.train_loader.sampler.epoch_indices(0).tolist(),
        # same shard WITHOUT drop_last trimming: rank coverage contract
        "shard_epoch0": ShardedIndexSampler(
            len(trainer.train_dataset), cfg.batch_size, rank, wc,
            shuffle=True, drop_last=False,
            seed=cfg.seed).epoch_indices(0).tolist(),
        "losses": losses,
        "logger_active": bool(trainer.logger.writers
                              or trainer.logger._jsonl),
    }
    with open(os.path.join(workdir, f"rank{rank}.json"), "w") as f:
        json.dump(record, f)
    print(f"child rank {rank}: losses={losses}", flush=True)
    barrier("end")


# -------------------------------------------------------------------- parent

def make_tree(workdir: str):
    """Synthetic KITTI tree + tiny split (mirrors tests/test_trainer.py)."""
    import numpy as np
    from PIL import Image

    root = os.path.join(workdir, "kitti")
    img_dir = os.path.join(root, DRIVE, "image_02", "data")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        small = rng.uniform(0, 255, (8, 12, 3))
        arr = np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:010d}.jpg"))
    splits = os.path.join(root, "splits", "tiny")
    os.makedirs(splits, exist_ok=True)
    with open(os.path.join(splits, "train_files.txt"), "w") as f:
        f.write("\n".join(f"{DRIVE} {i} l" for i in range(1, 7)))
    with open(os.path.join(splits, "val_files.txt"), "w") as f:
        # 4 lines: per-rank val batch 2 -> global 4, divisible by data=4
        f.write("\n".join(f"{DRIVE} {i} l" for i in (1, 2, 5, 6)))
    return root


def parent(workdir: str, timeout: int = 900) -> dict:
    make_tree(workdir)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(WORLD):
        logf = open(os.path.join(workdir, f"rank{rank}.log"), "w")
        procs.append((subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child", str(rank),
             str(WORLD), str(port), workdir],
            stdout=logf, stderr=subprocess.STDOUT, cwd=REPO), logf))
    codes = []
    for p, logf in procs:
        try:
            codes.append(p.wait(timeout=timeout))
        except subprocess.TimeoutExpired:
            p.kill()
            codes.append("timeout")
        logf.close()
    if any(c != 0 for c in codes):
        for rank in range(WORLD):
            path = os.path.join(workdir, f"rank{rank}.log")
            print(f"----- rank {rank} log -----")
            print(open(path).read()[-4000:])
        raise SystemExit(f"child exit codes: {codes}")

    recs = [json.load(open(os.path.join(workdir, f"rank{r}.json")))
            for r in range(WORLD)]

    # 1. topology
    for r in recs:
        assert r["global_devices"] == 8 and r["local_devices"] == 4, r

    # 2. disjoint loader shards (DistributedSampler contract,
    #    reference: utils.py:79-87): the trained (drop_last) shards are
    #    disjoint; the untrimmed shards are disjoint AND cover the split
    sets = [set(r["indices_epoch0"]) for r in recs]
    assert sets[0] and sets[1] and not (sets[0] & sets[1]), sets
    full = [set(r["shard_epoch0"]) for r in recs]
    assert not (full[0] & full[1]), full
    assert full[0] | full[1] == set(range(6)), full
    assert sets[0] <= full[0] and sets[1] <= full[1], (sets, full)

    # 3. identical finite loss on every step (global all-reduce)
    l0, l1 = recs[0]["losses"], recs[1]["losses"]
    assert len(l0) == len(l1) >= 1, (l0, l1)
    for a, b in zip(l0, l1):
        assert abs(a - b) <= 1e-5 * max(1.0, abs(a)), (l0, l1)
        assert a == a and abs(a) < 1e6, l0  # finite

    # 4. rank-0-only logging + checkpoints
    assert recs[0]["logger_active"] and not recs[1]["logger_active"]
    models_dir = os.path.join(workdir, "log", "mp", "models")
    names = sorted(os.listdir(models_dir))
    assert "opt.json" in names and "last" in names and "weights_0" in names, \
        names
    for mode in ("train", "val"):
        wdir = os.path.join(workdir, "log", "mp", mode)
        if os.path.isdir(wdir):
            events = [f for f in os.listdir(wdir) if "events" in f]
            assert len(events) == 1, (mode, events)

    summary = {
        "ok": True, "world": WORLD, "devices_per_process": 4,
        "mesh": recs[0]["mesh"], "losses": l0,
        "rank_indices": [sorted(s) for s in sets],
        "checkpoints": [n for n in names if n != "opt.json"],
    }
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "multiproc_dryrun.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("multiproc_dryrun: OK "
          f"(2 procs x 4 devices, loss={l0}, shards={summary['rank_indices']})")
    return summary


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              sys.argv[5])
    else:
        import tempfile
        with tempfile.TemporaryDirectory(prefix="mpdry_") as d:
            parent(d)
