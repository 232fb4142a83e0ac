#!/usr/bin/env bash
# One-command real-weights rehearsal (docs/REALWEIGHTS_RUNBOOK.md):
# fake full-size checkpoint -> convert -> verify -> on-chip serve -> report.
# Day one with real weights: REH_CKPT=<downloaded μ²Qwen3 dir> and skip emit.
set -ex
cd "$(dirname "$0")"
ART=docs/artifacts/r4
mkdir -p "$ART"
export REH_STATE=${REH_STATE:-/tmp/u2_rehearsal_state.json}
rm -f "$REH_STATE"

REH_STAGE=emit    timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=convert timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=verify  timeout 7200 python tools_rehearse_real_weights.py
REH_STAGE=serve   timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=report  python tools_rehearse_real_weights.py \
  | tee "$ART/realweights_rehearsal.json"
