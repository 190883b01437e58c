#!/bin/bash
# Round-2 construction queue: at most 2 concurrent (2 host cores).
cd /root/repo
export JAX_PLATFORMS=cpu
C="python -m informationbottleneckdecodingldpc_tpu.cli.construct"
L=artifacts/logs
run() { echo "[$(date +%T)] start $2"; $C $1 --output "$2" --verbose > "$L/$(basename $2 .npz).log" 2>&1 && echo "[$(date +%T)] done $2" || echo "[$(date +%T)] FAILED $2"; }
run "--model wlan-1296 --ebn0 0.8" artifacts/configs/wlan_T16_0.8.npz &
A=$!
run "--model regular-3-6-8000 --ebn0 1.05" artifacts/configs/regular_T16_1.05.npz &
B=$!
wait $A
run "--model dvbs2-64800 --ebn0 0.6" artifacts/configs/dvbs2_T16_0.6.npz &
A=$!
wait $B
run "--model wlan-1296-T32 --ebn0 0.6" artifacts/configs/wlan_T32_0.6.npz &
B=$!
wait $A $B
echo "[$(date +%T)] all constructions complete"
