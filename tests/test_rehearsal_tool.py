"""Smoke the real-weights rehearsal tool (REH_TINY CPU mode).

The rehearsal script is the day-one runbook executable
(docs/REALWEIGHTS_RUNBOOK.md); its stage-resume behavior is what makes a
multi-hour run survivable. The r5d queue lost a finished ~50-minute int8
quant leg to a stage timeout mid-int4 because the stage only saved state
at the very end — the per-mode sub-stage resume (quant_int8/quant_int4
keys) is regression-tested here at tiny geometry.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_stage(stage, tmp, extra_env=None, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # tiny mode forces cpu itself
    env.update({
        "REH_TINY": "1",
        "REH_STAGE": stage,
        "REH_STATE": os.path.join(tmp, "state.json"),
        "REH_CKPT": os.path.join(tmp, "ckpt"),
        "REH_OUT": os.path.join(tmp, "converted"),
    }, **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools_rehearse_real_weights.py")],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stderr


@pytest.mark.slow
def test_quant_stage_resumes_per_mode(tmp_path):
    tmp = str(tmp_path)
    state_path = os.path.join(tmp, "state.json")
    _run_stage("emit", tmp)
    _run_stage("convert", tmp)
    _run_stage("quant", tmp)

    state = json.load(open(state_path))
    assert {"quant_int8", "quant_int4", "quant"} <= set(state)
    assert state["quant"]["int8"]["decision"] is not None

    # simulate the r5d failure shape: the stage died mid-int4 — the
    # int8 sub-stage survives in state, quant/quant_int4 do not
    del state["quant"]
    del state["quant_int4"]
    json.dump(state, open(state_path, "w"))

    err = _run_stage("quant", tmp)
    assert "quant_int8 already recorded, skipping" in err
    state = json.load(open(state_path))
    assert {"quant_int8", "quant_int4", "quant"} <= set(state)
    # the assembled summary still carries both modes
    assert set(state["quant"]) >= {"int8", "int4", "wall_s"}
