#!/bin/bash
cd /root/repo
while kill -0 23598 2>/dev/null; do sleep 20; done
sleep 5
echo "[$(date +%T)] regular_ib 1.25 dB design (converged DE, MI 1.0)"
python -m informationbottleneckdecodingldpc_tpu.cli.simulate \
  --model regular-3-6-8000 --decoder ib \
  --config artifacts/configs/regular_T16_1.25.npz --chain allzero \
  --start-db 0.8 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 29 \
  --results results/ber/regular_ib_d125.json \
  --export-npz results/ber/regular_ib_d125.npz \
  --export-plot results/ber/regular_ib_d125.png \
  > artifacts/logs/sweep_regular_ib_d125.log 2>&1 \
  && echo "[$(date +%T)] done regular_ib_d125" || echo "[$(date +%T)] FAILED regular_ib_d125"
python scripts/make_parity_report.py > /dev/null 2>&1
echo "[$(date +%T)] after_queue4 complete"
