#!/bin/bash
# Parity artifact regeneration (PARITY.json), sequenced on the one TPU.
#   stage 1: train UNetSP 10k @128, full int8 sweep + foreground-crop columns
#   stage 2: QAT distillation fine-tune of that checkpoint
#   stage 3: merge the QAT columns into PARITY.json (same fingerprint)
#   stage 4: train UNetSPSmall, sliding-window (patch) parity at the 512 config
#
# Tunnel discipline (docs/tpu_tunnel.md): probe with a REAL op before and
# between stages (jax.devices() succeeding proves nothing), bound every
# stage with a TERM timeout (never SIGKILL a busy client), and wait out
# wedges — the remote side recovers on its own after 20-50 min.
cd /root/repo
mkdir -p .ckpts
# keep any preexisting entries (e.g. the axon TPU plugin site dir)
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

probe() {
  for i in $(seq 1 70); do
    if timeout 55 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))" > /dev/null 2>&1; then
      echo "[pipeline] tunnel ok"; return 0
    fi
    echo "[pipeline] tunnel wedged, retry $i"; sleep 45
  done
  echo "[pipeline] tunnel not recovering"; return 1
}

run() { # run <seconds> <label> <cmd...>  — sets global RC for stage gating
  local sec=$1 label=$2; shift 2
  echo "=== [pipeline] $label (cap ${sec}s) at $(date +%T) ==="
  # TERM only (no -k): SIGKILLing a busy JAX client mid-RPC is the exact
  # tunnel-wedge trigger docs/tpu_tunnel.md forbids. A client that
  # ignores TERM holds its stage slot; the probe below waits it out.
  timeout "$sec" "$@"
  RC=$?
  echo "=== [pipeline] $label rc=$RC ==="
  if [ $RC -ne 0 ]; then probe || exit 1; fi
}

probe || exit 1
run 3600 stage1 python tools/parity_check.py --steps 10000 \
    --ckpt .ckpts/unetsp_10k --crop
# Dependent stages gate on the artifacts the prior stage must have
# produced (ADVICE r4: running against a missing/stale checkpoint wastes
# the slot, and --merge against a retrained stage1 is fingerprint-refused).
if [ -d .ckpts/unetsp_10k ]; then
  run 900 stage2 python tools/qat_tune.py --ckpt .ckpts/unetsp_10k --steps 800
  if [ $RC -eq 0 ] && [ -d .ckpts/unetsp_10k_qat ]; then
    run 900 stage3 python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
        --qat-ckpt .ckpts/unetsp_10k_qat --configs 0:0:0,0:0:1 --merge
  else
    echo "[pipeline] stage3 skipped: stage2 rc=$RC or QAT ckpt missing"
  fi
else
  echo "[pipeline] stage2+3 skipped: .ckpts/unetsp_10k missing"
fi
run 2400 stage4 python tools/parity_check.py --model UNetSPSmall \
    --steps 3000 --ckpt .ckpts/unetspsmall_3k --patch --merge
echo "[pipeline] done"
