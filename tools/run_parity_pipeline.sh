#!/bin/bash
# Round-4 parity artifact regeneration (VERDICT r3 items 4, 5, 8).
# Sequenced on the one real TPU chip; ~60-90 min end to end.
#   stage 1: train UNetSP 10k @128, full int8 sweep + foreground-crop columns
#   stage 2: QAT distillation fine-tune of that checkpoint
#   stage 3: merge the QAT columns into PARITY.json (same fingerprint)
#   stage 4: train UNetSPSmall, sliding-window (patch) parity at the 512 config
set -x
cd /root/repo
mkdir -p .ckpts
# keep any preexisting entries (e.g. the axon TPU plugin site dir)
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== stage 1: UNetSP 10k + sweep + crop ==="
python tools/parity_check.py --steps 10000 --ckpt .ckpts/unetsp_10k --crop \
  || exit 1

echo "=== stage 2: QAT tune ==="
python tools/qat_tune.py --ckpt .ckpts/unetsp_10k --steps 800 || exit 2

echo "=== stage 3: merge QAT columns ==="
python tools/parity_check.py --ckpt .ckpts/unetsp_10k \
  --qat-ckpt .ckpts/unetsp_10k_qat --configs 0:0:0,0:0:1 --merge || exit 3

echo "=== stage 4: UNetSPSmall + patch parity ==="
python tools/parity_check.py --model UNetSPSmall --steps 10000 \
  --ckpt .ckpts/unetspsmall_10k --patch --merge || exit 4

echo "=== pipeline done ==="
