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
# REH_RESUME=1: keep the state file and skip stages it already records
# (a crashed stage mid-run doesn't force the ~1h emit+convert+verify
# stages to repeat — their on-disk outputs are still valid inputs)
if [ "${REH_RESUME:-0}" != "1" ]; then rm -f "$REH_STATE"; fi
have() {
  [ "${REH_RESUME:-0}" = "1" ] && python - "$1" <<'EOF'
import json, os, sys
state = os.environ.get("REH_STATE", "/tmp/u2_rehearsal_state.json")
try:
    sys.exit(0 if sys.argv[1] in json.load(open(state)) else 1)
except Exception:
    sys.exit(1)
EOF
}

have emit    || REH_STAGE=emit    timeout 3600 python tools_rehearse_real_weights.py
have convert || REH_STAGE=convert timeout 3600 python tools_rehearse_real_weights.py
have verify  || REH_STAGE=verify  timeout 7200 python tools_rehearse_real_weights.py
have quant   || REH_STAGE=quant   timeout "${REH_QUANT_TIMEOUT:-7200}" python tools_rehearse_real_weights.py
have serve   || REH_STAGE=serve   timeout 3600 python tools_rehearse_real_weights.py
# the int4-weight candidate leg the quant gate decides about
have serve_int4 || REH_STAGE=serve REH_WQ=int4 timeout 3600 python tools_rehearse_real_weights.py
REH_STAGE=report  python tools_rehearse_real_weights.py \
  | tee "$ART/realweights_rehearsal.json"
