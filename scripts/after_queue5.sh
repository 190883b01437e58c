#!/bin/bash
cd /root/repo
while kill -0 24289 2>/dev/null; do sleep 20; done
sleep 5
echo "[$(date +%T)] regular_ib_allzero (1.05 design, fixed kernel)"
python -m informationbottleneckdecodingldpc_tpu.cli.simulate \
  --model regular-3-6-8000 --decoder ib \
  --config artifacts/configs/regular_T16_1.05.npz --chain allzero \
  --start-db 0.5 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 23 \
  --results results/ber/regular_ib_allzero.json \
  --export-npz results/ber/regular_ib_allzero.npz \
  --export-plot results/ber/regular_ib_allzero.png \
  > artifacts/logs/sweep_regular_ib_allzero.log 2>&1 \
  && echo "[$(date +%T)] done regular_ib_allzero" || echo "[$(date +%T)] FAILED regular_ib_allzero"
echo "[$(date +%T)] full bench matrix (fixed kernel)"
python scripts/bench_matrix.py > artifacts/logs/bench_matrix.log 2>&1 \
  && echo "[$(date +%T)] bench matrix done" || echo "[$(date +%T)] bench matrix FAILED"
python scripts/make_parity_report.py > /dev/null 2>&1
echo "[$(date +%T)] after_queue5 complete"
