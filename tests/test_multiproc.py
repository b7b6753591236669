"""True 2-OS-process data-parallel execution.

The reference's actual launch mode is N processes, one per GPU
(reference: train_movedepth.sh:15 torch.distributed.launch; rank plumbing
movedepth/utils.py:51-70). scripts/multiproc_dryrun.py runs our
equivalent for real -- 2 localhost processes x 4 virtual CPU devices,
one global (data=4, model=2) mesh, gloo collectives, production Trainer --
and asserts the distributed contracts (disjoint loader shards, identical
loss on every rank, rank-0-only checkpoints and logging). This test just
drives it and checks the artifact.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiproc_dryrun.py")],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    with open(os.path.join(REPO, "artifacts", "multiproc_dryrun.json")) as f:
        art = json.load(f)
    assert art["ok"] and art["world"] == 2
    assert art["mesh"] == {"data": 4, "model": 2}
    assert len(art["losses"]) >= 1
    assert not (set(art["rank_indices"][0]) & set(art["rank_indices"][1]))
    assert "last" in art["checkpoints"] and "weights_0" in art["checkpoints"]
