"""All CLI entry points parse --help cleanly (import + argparse smoke)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    "scripts/pretrain.py",
    "scripts/pretrain_fixres.py",
    "scripts/validate.py",
    "scripts/finetune_vcr.py",
    "scripts/finetune_tvqa.py",
    "scripts/vcr_leaderboard.py",
    "scripts/prep_vcr.py",
    "scripts/prep_tvqa.py",
    "scripts/plan_memory.py",
    "scripts/audit_comm.py",
    "scripts/zero_shot_tvqa.py",
    "scripts/zero_shot_vcr.py",
    "scripts/convert_checkpoint.py",
    "scripts/export_serving.py",
    "scripts/bench_quant_serving.py",
    "demo/demo_video.py",
    "demo/load_video.py",
    "demo/zero_shot_ek100.py",
    "demo/zero_shot_qa.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()


def test_plan_memory_cli():
    import json

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "plan_memory.py"),
         "base", "--batch", "4", "--flash-joint"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-800:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["fits"] is True  # the measured flash batch-4 point
