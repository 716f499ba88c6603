#!/bin/bash
# Round-5 drift triage: 10 ps arms (50k steps @ 0.2 fs) on the real chip.
# One arm at a time (single chip). Results append to artifacts/drift_triage_r05.jsonl
cd /root/repo
OUT=artifacts/drift_triage_r05.jsonl
: > $OUT
run() {
  echo "=== ARM: $* ===" >&2
  timeout 1800 python tools/nve_drift.py --steps 50000 --therm 2000 --seg 1000 "$@" >> $OUT 2>/tmp/drift_arm_err.log \
    || echo "{\"error\": \"arm failed: $*\"}" >> $OUT
}
# A: round-4 shipped defaults (control)
run --aspc-k 3 --n-corr 1
# B: + dispersion switch 0.1 nm
run --aspc-k 3 --n-corr 1 --disp-switch 0.1
# C: + kahan
run --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan
# D: + deeper corrector
run --aspc-k 3 --n-corr 2 --disp-switch 0.1 --kahan
# E: deeper predictor + corrector
run --aspc-k 4 --n-corr 3 --disp-switch 0.1 --kahan
# F: SOR tight-eps control (round-4 found 1e-4 dissipative at -10000 K/ns)
MBPOL_F32_SCF_EPS_FLOOR=1e-6 run --scf sor --epsilon 1e-6 --disp-switch 0.1 --kahan
echo "TRIAGE DONE" >&2
