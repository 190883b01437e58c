#!/bin/bash
# Follow-up: wait for the main parity queue, retry regular-8000 (fused VMEM
# fix), rerun DVB-S2 with the converged 0.8 dB design (the 0.6 dB DE stalls
# at MI 0.68 and its tables cap the decoder at every SNR), then bench matrix
# + parity report.
cd /root/repo
while pgrep -f "run_parity_sweeps.sh" > /dev/null 2>&1; do sleep 30; done
sleep 5
S="python -m informationbottleneckdecodingldpc_tpu.cli.simulate"
echo "[$(date +%T)] retry regular_ib_allzero"
$S --model regular-3-6-8000 --decoder ib \
  --config artifacts/configs/regular_T16_1.05.npz --chain allzero \
  --start-db 0.5 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 23 \
  --results results/ber/regular_ib_allzero.json \
  --export-npz results/ber/regular_ib_allzero.npz \
  --export-plot results/ber/regular_ib_allzero.png \
  > artifacts/logs/sweep_regular_ib_allzero.log 2>&1 \
  && echo "[$(date +%T)] done regular_ib_allzero" || echo "[$(date +%T)] FAILED regular_ib_allzero"
echo "[$(date +%T)] dvbs2 with 0.8 dB design"
$S --model dvbs2-64800 --decoder ib \
  --config artifacts/configs/dvbs2_T16_0.8.npz --chain encoded \
  --start-db 0.8 --max-db 1.4 --min-errors 5000 --target-ber 1e-5 \
  --max-blocks-per-point 60000 --batch-per-device 128 --seed 28 \
  --results results/ber/dvbs2_ib_enc_d08.json \
  --export-npz results/ber/dvbs2_ib_enc_d08.npz \
  --export-plot results/ber/dvbs2_ib_enc_d08.png \
  > artifacts/logs/sweep_dvbs2_ib_enc_d08.log 2>&1 \
  && echo "[$(date +%T)] done dvbs2_d08" || echo "[$(date +%T)] FAILED dvbs2_d08"
echo "[$(date +%T)] bench matrix"
python scripts/bench_matrix.py > artifacts/logs/bench_matrix.log 2>&1 \
  && echo "[$(date +%T)] bench matrix done" || echo "[$(date +%T)] bench matrix FAILED"
python scripts/make_parity_report.py > /dev/null 2>&1
echo "[$(date +%T)] after_queue complete"
