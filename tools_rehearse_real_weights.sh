#!/usr/bin/env bash
# One-command real-weights rehearsal (docs/REALWEIGHTS_RUNBOOK.md):
# fake full-size checkpoint -> convert -> verify -> quant-quality gate ->
# on-chip serve (int8 + the int4w candidate leg) -> report.
# Day one with real weights: REH_CKPT=<downloaded μ²Qwen3 dir>
# REH_DECISION_GRADE=1 and skip emit.
set -ex
cd "$(dirname "$0")"
ART=${ART:-docs/artifacts/r5}
mkdir -p "$ART"
export REH_STATE=${REH_STATE:-/tmp/u2_rehearsal_state.json}
rm -f "$REH_STATE"

REH_STAGE=emit    timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=convert timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=verify  timeout 7200 python tools_rehearse_real_weights.py
REH_STAGE=quant   timeout 7200 python tools_rehearse_real_weights.py
REH_STAGE=serve   timeout 3600 python tools_rehearse_real_weights.py
# the int4-weight candidate leg the quant gate decides about
REH_STAGE=serve REH_WQ=int4 timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=report  python tools_rehearse_real_weights.py \
  | tee "$ART/realweights_rehearsal.json"
