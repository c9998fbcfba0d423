#!/bin/bash
# Round-5 TPU evidence queue, sequenced on the one chip (tunnel
# discipline per docs/tpu_tunnel.md: real-op probe between stages,
# TERM-only timeouts, dependent stages gated on artifacts).
#   margin_sweep: fg-crop margin sweep 16/24/32/48 -> PARITY.json _mN cols
#   qat + qat_cols: QAT fine-tune + dice_*_qat columns (VERDICT r4 item 3)
#   spsmall: UNetSPSmall 3k train + patch parity at the 512 config
#   serve_scan: productized scan serving through the public Model surface
#   attr_train: top-op attribution of the 581 ms full-res train step
cd /root/repo
mkdir -p .ckpts
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

probe() {
  for i in $(seq 1 70); do
    if timeout 55 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))" > /dev/null 2>&1; then
      echo "[queue] tunnel ok"; return 0
    fi
    echo "[queue] tunnel wedged, retry $i"; sleep 45
  done
  echo "[queue] tunnel not recovering"; return 1
}

run() { # run <seconds> <label> <cmd...> — sets global RC
  local sec=$1 label=$2; shift 2
  echo "=== [queue] $label (cap ${sec}s) at $(date +%T) ==="
  timeout "$sec" "$@"
  RC=$?
  echo "=== [queue] $label rc=$RC ==="
  if [ $RC -ne 0 ]; then probe || exit 1; fi
}

probe || exit 1
run 3000 margin_sweep python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
    --configs 0:0:0 --crop --crop-margins 16,24,32,48 --merge
run 1500 qat python tools/qat_tune.py --ckpt .ckpts/unetsp_10k --steps 800
if [ -d .ckpts/unetsp_10k_qat ]; then
  run 1500 qat_cols python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
      --qat-ckpt .ckpts/unetsp_10k_qat --configs 0:0:0,0:0:1 --merge
else
  echo "[queue] qat_cols skipped: QAT checkpoint missing"
fi
run 3000 spsmall python tools/parity_check.py --model UNetSPSmall \
    --steps 3000 --ckpt .ckpts/unetspsmall_3k --patch --merge
run 1800 serve_scan python tools/bench_serve.py --n 16 --int8 --fg-crop \
    --scan 4 --profile
run 1200 attr_train python tools/attr_train.py --remat none
echo "[queue] done"
