#!/bin/bash
# Round-5 final drift campaign: post-fix (PME field operator + PIP grad
# HIGHEST defaults) water256 f32 NVE.
cd /root/repo
OUT=artifacts/drift_final_r05.jsonl
: > $OUT
run() {
  echo "=== FINAL ARM: $* ===" >&2
  timeout 5400 python tools/nve_drift.py --therm 4000 --seg 1000 "$@" >> $OUT 2>/tmp/drift_final_err.log \
    || echo "{\"error\": \"arm failed: $*\"}" >> $OUT
}
# quick 10 ps sanity at the production recipe
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan
# the 50 ps artifact run
run --steps 250000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan
# SOR tight-eps control, 10 ps (the fully-converged floor)
MBPOL_F32_SCF_EPS_FLOOR=1e-6 run --steps 50000 --scf sor --epsilon 1e-6 --disp-switch 0.1 --kahan
echo "FINAL DONE" >&2
