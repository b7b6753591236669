"""The kernel-feature degradation ladder walked by bench.py / __graft_entry__.

A Mosaic toolchain change can reject a custom-kernel rung at COMPILE time,
where the runtime lax.cond coverage ladders cannot catch it; the graded
artifacts must still emit a number by degrading tier by tier down to the
pure-XLA formulation (config.KERNEL_TIERS).
"""

import json
import sys

import pytest

from movedepth_tpu.config import Config, KERNEL_TIERS, validate


def test_tiers_are_valid_configs():
    for name, overrides in KERNEL_TIERS:
        cfg = validate(Config().replace(**overrides))
        assert isinstance(name, str) and name


def test_last_tier_is_pure_xla():
    _, overrides = KERNEL_TIERS[-1]
    cfg = Config().replace(**overrides)
    assert not cfg.pallas_warp
    assert cfg.sweep_row_window == 0
    assert cfg.sweep_col_window == 0
    assert cfg.warp_col_window == 0


def test_first_tier_is_shipped_config():
    _, overrides = KERNEL_TIERS[0]
    assert overrides == {}


def test_bench_degrades_on_tier_failure(monkeypatch, capsys):
    """bench.main walks the ladder past failing tiers and still prints
    the one-line JSON."""
    sys.path.insert(0, "/root/repo")
    import bench

    calls = []

    def fake_run_tier(cfg):
        calls.append(cfg)
        if len(calls) < 3:
            raise RuntimeError("Mosaic rejected the kernel")
        return 1234.5

    monkeypatch.setattr(bench, "run_tier", fake_run_tier)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 1234.5
    assert rec["unit"] == "frames/s"
    assert len(calls) == 3
    assert calls[1].sweep_col_window == 0  # tier 2 disabled the rung


def test_bench_raises_when_all_tiers_fail(monkeypatch, capsys):
    sys.path.insert(0, "/root/repo")
    import bench

    def fake_run_tier(cfg):
        raise RuntimeError("no backend")

    monkeypatch.setattr(bench, "run_tier", fake_run_tier)
    with pytest.raises(SystemExit):
        bench.main()
    assert capsys.readouterr().out.strip() == ""
