#!/bin/bash
cd /root/repo
while kill -0 19379 2>/dev/null; do sleep 30; done
sleep 5
echo "[$(date +%T)] retry regular_ib_allzero (lax.map sub-128 tile fix)"
python -m informationbottleneckdecodingldpc_tpu.cli.simulate \
  --model regular-3-6-8000 --decoder ib \
  --config artifacts/configs/regular_T16_1.05.npz --chain allzero \
  --start-db 0.5 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 23 \
  --results results/ber/regular_ib_allzero.json \
  --export-npz results/ber/regular_ib_allzero.npz \
  --export-plot results/ber/regular_ib_allzero.png \
  > artifacts/logs/sweep_regular_ib_allzero.log 2>&1 \
  && echo "[$(date +%T)] done regular_ib_allzero" || echo "[$(date +%T)] FAILED regular_ib_allzero"
echo "[$(date +%T)] regular minsum extension to 3.0 dB"
python -m informationbottleneckdecodingldpc_tpu.cli.simulate \
  --model regular-3-6-8000 --decoder minsum --chain allzero \
  --start-db 0.5 --max-db 3.0 --max-iters 50 --min-errors 7000 \
  --batch-per-device 256 --steps-per-dispatch 4 --seed 26 \
  --results results/ber/regular_minsum.json \
  --export-npz results/ber/regular_minsum.npz \
  --export-plot results/ber/regular_minsum.png \
  >> artifacts/logs/sweep_regular_minsum.log 2>&1 \
  && echo "[$(date +%T)] done regular_minsum ext" || echo "[$(date +%T)] FAILED regular_minsum ext"
python scripts/make_parity_report.py > /dev/null 2>&1
echo "[$(date +%T)] after_queue2 complete"
