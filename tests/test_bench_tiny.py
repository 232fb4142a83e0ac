"""Smoke the bench harness itself (BENCH_TINY CPU mode).

bench.py is the driver-recorded headline path; its setup ordering (weight
build → quantize → CT-batch allocation, commit 350e597) and branch
plumbing (int8w default / structural int4w) are exactly the kind of thing
that silently breaks between rounds. BENCH_TINY=1 runs the whole flow on
CPU at tiny geometry — same code path, a few tokens.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # tiny mode forces cpu itself
    env.update({"BENCH_TINY": "1", "BENCH_ALT_TOO": "0"}, **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_bench_tiny_default_config():
    out = _run_bench({"BENCH_BATCH": "4"})
    assert out["metric"] == "reports/min/chip"
    assert out["value"] > 0
    d = out["detail"]
    assert d["weights"] == "int8" and d["kv_cache"] == "int4"
    assert d["batch"] == 4 and d["model"].endswith("(random weights)")


@pytest.mark.slow
def test_bench_tiny_int4_structural_branch():
    out = _run_bench({"BENCH_BATCH": "2", "BENCH_WQ": "int4"})
    assert out["value"] > 0 and out["detail"]["weights"] == "int4"


@pytest.fixture(scope="module")
def tiny_converted_ckpt(tmp_path_factory):
    """Emit + convert a tiny checkpoint via the rehearsal tool stages."""
    tmp = str(tmp_path_factory.mktemp("bench_ckpt"))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({"REH_TINY": "1",
                "REH_STATE": os.path.join(tmp, "state.json"),
                "REH_CKPT": os.path.join(tmp, "ckpt"),
                "REH_OUT": os.path.join(tmp, "converted")})
    for stage in ("emit", "convert"):
        env["REH_STAGE"] = stage
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools_rehearse_real_weights.py")],
            env=env, check=True, capture_output=True, timeout=600, cwd=REPO)
    return os.path.join(tmp, "converted")


@pytest.mark.slow
def test_bench_ckpt_geometry_reconciliation(tiny_converted_ckpt):
    """BENCH_CKPT mounts the converted dir, labels the artifact with the
    checkpoint path, and detects the checkpoint's model family — a
    mismatched explicit BENCH_MODEL must abort instead of benching the
    wrong batch/baseline (the 8B-dir-without-BENCH_MODEL footgun)."""
    out = _run_bench({"BENCH_BATCH": "2", "BENCH_CKPT": tiny_converted_ckpt})
    assert tiny_converted_ckpt in out["detail"]["model"]
    assert out["value"] > 0

    # tiny geometry detects as 1.7b; claiming 8b must SystemExit
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({"BENCH_TINY": "1", "BENCH_ALT_TOO": "0",
                "BENCH_CKPT": tiny_converted_ckpt, "BENCH_MODEL": "8b"})
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode != 0
    assert "unset BENCH_MODEL" in proc.stderr + proc.stdout
