#!/bin/bash
# Round-5 follow-up TPU queue (after run_r5_queue.sh):
#   qat_cols: retry with a realistic cap and minimal --configs (the
#             1500s first attempt timed out mid-eval)
#   aq_crop:  int8+AdaQuant crop parity at margins 16/24 — the SHIPPING
#             serving config's numbers for the headline table
#   bench24:  re-measure the headline at the newly-shipped fg margin 24
#   probes:   pack-32 / two-volume lane-packing formulation probes
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

probe() {
  for i in $(seq 1 70); do
    if timeout 55 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))" > /dev/null 2>&1; then
      echo "[followup] tunnel ok"; return 0
    fi
    echo "[followup] tunnel wedged, retry $i"; sleep 45
  done
  echo "[followup] tunnel not recovering"; return 1
}

run() {
  local sec=$1 label=$2; shift 2
  echo "=== [followup] $label (cap ${sec}s) at $(date +%T) ==="
  timeout "$sec" "$@"
  RC=$?
  echo "=== [followup] $label rc=$RC ==="
  if [ $RC -ne 0 ]; then probe || exit 1; fi
}

probe || exit 1
if [ -d .ckpts/unetsp_10k_qat ]; then
  run 2700 qat_cols python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
      --qat-ckpt .ckpts/unetsp_10k_qat --configs 0:0:0 --merge
fi
run 3600 aq_crop python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
    --configs 0:0:0 --crop --crop-margins 16,24 --merge
# retry of the timed-out spsmall patch stage: checkpoint exists so
# training is skipped, and one int8 config instead of the full sweep
if [ -d .ckpts/unetspsmall_3k ]; then
  run 3000 spsmall_patch python tools/parity_check.py --model UNetSPSmall \
      --ckpt .ckpts/unetspsmall_3k --configs 0:0:0 --patch --merge
fi
run 1800 bench24 env BENCH_BUDGET_S=1500 python bench.py
run 1500 probes python tools/probes/mb_pack_formulations.py
echo "[followup] done"
