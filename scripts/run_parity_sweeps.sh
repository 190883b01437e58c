#!/bin/bash
# Round-2 BER-parity sweep queue (sequential: one real TPU chip).
# Every sweep is resumable: rerunning this script skips completed points.
# Operating points: BASELINE.md:20-29.
cd /root/repo
mkdir -p results/ber artifacts/logs
S="python -m informationbottleneckdecodingldpc_tpu.cli.simulate"
L=artifacts/logs

run() { name=$1; shift
  echo "[$(date +%T)] sweep $name"
  $S "$@" --results "results/ber/$name.json" \
    --export-npz "results/ber/$name.npz" --export-plot "results/ber/$name.png" \
    >> "$L/sweep_$name.log" 2>&1 \
    && echo "[$(date +%T)] done $name" || echo "[$(date +%T)] FAILED $name"
}

# 1. WLAN |T|=16 IB, full encoded chain, reference operating point
#    (Irregular_LDPC_Decoding/WLAN/BER_simulation_OpenCL_enc.py:47-72).
run wlan_ib_T16_enc --model wlan-1296 --decoder ib \
  --config artifacts/configs/wlan_T16_0.8.npz --chain encoded \
  --start-db 0.6 --min-errors 7000 --batch-per-device 512 --steps-per-dispatch 8 --seed 20

# 2./3. WLAN benchmark decoders (min-sum, quantized BP), encoded chain
#    (BER_simulation_OpenCL_min_sum.py:44-64, BER_simulation_OpenCL_quant_BP.py:44-63).
run wlan_minsum_enc --model wlan-1296 --decoder minsum --chain encoded \
  --start-db 0.6 --min-errors 7000 --batch-per-device 512 --steps-per-dispatch 8 --seed 21
run wlan_bp_enc --model wlan-1296 --decoder bp --chain encoded \
  --start-db 0.6 --min-errors 7000 --batch-per-device 512 --steps-per-dispatch 8 --seed 22

# 4. Regular (3,6) N=8000 IB, all-zeros direct sampling, decode i_max=250
#    (Regular_LDPC_Decoding/BPSK/BER_simulation_OpenCL.py:35-55).
run regular_ib_allzero --model regular-3-6-8000 --decoder ib \
  --config artifacts/configs/regular_T16_1.05.npz --chain allzero \
  --start-db 0.5 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 23

# 5. WLAN |T|=32 IB (the reference's published construction setting,
#    WLAN/decoder_config_generation.py:24-37).
run wlan_ib_T32_enc --model wlan-1296-T32 --decoder ib \
  --config artifacts/configs/wlan_T32_0.6.npz --chain encoded \
  --start-db 0.6 --min-errors 7000 --batch-per-device 512 --steps-per-dispatch 8 --seed 24

# 6. DVB-S2 N=64800 IB, full encoded chain
#    (DVB-S2/BER_simulation_OpenCL_enc.py:48-73). target-ber relaxed to 1e-5:
#    the N=64800 XLA path is ~Mbit/s, 1e-6 would take many hours.
run dvbs2_ib_enc --model dvbs2-64800 --decoder ib \
  --config artifacts/configs/dvbs2_T16_0.6.npz --chain encoded \
  --start-db 0.6 --max-db 1.3 --min-errors 5000 --target-ber 1e-5 \
  --max-blocks-per-point 200000 --batch-per-device 128 --seed 25

# 7. Regular min-sum benchmark (BER_simulation_OpenCL_min_sum.py:36-61).
run regular_minsum --model regular-3-6-8000 --decoder minsum --chain allzero \
  --start-db 0.5 --max-iters 50 --min-errors 7000 --batch-per-device 256 --steps-per-dispatch 4 --seed 26

# 8. DVB-S2 min-sum benchmark (DVB-S2/BER_simulation_OpenCL_min_sum.py:41-77).
run dvbs2_minsum --model dvbs2-64800 --decoder minsum --chain allzero \
  --start-db 0.6 --max-db 1.3 --min-errors 5000 --target-ber 1e-5 \
  --max-blocks-per-point 200000 --batch-per-device 128 --seed 27

echo "[$(date +%T)] parity sweep queue complete"
