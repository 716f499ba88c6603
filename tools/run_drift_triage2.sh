#!/bin/bash
# Wave 2: discriminate f32-noise floor vs closure error.
cd /root/repo
OUT=artifacts/drift_triage2_r05.jsonl
: > $OUT
# wait for wave 1 to finish (single chip)
while kill -0 $(cat /tmp/drift_triage.pid) 2>/dev/null; do sleep 20; done
run() {
  echo "=== ARM2: $* ===" >&2
  timeout 3600 python tools/nve_drift.py --therm 2000 --seg 1000 "$@" >> $OUT 2>/tmp/drift_arm2_err.log \
    || echo "{\"error\": \"arm failed: $*\"}" >> $OUT
}
# G: dt 0.1 fs (noise heating halves; closure error collapses ~2^8)
run --steps 100000 --dt-fs 0.1 --aspc-k 3 --n-corr 2 --disp-switch 0.1 --kahan
# H: no electrostatics, switched dispersion (conservative-terms floor)
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --terms one_body,two_body,three_body,dispersion
# I: deeper corrector n_corr=4
run --steps 50000 --aspc-k 3 --n-corr 4 --disp-switch 0.1 --kahan
echo "TRIAGE2 DONE" >&2
# J: rare rebuilds (skin 0.1 nm) - discriminates rebuild-event injection
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --skin 0.1
echo "TRIAGE2+J DONE" >&2
# L: tighter Ewald tolerance (bigger alpha -> 10x smaller erfc jump at the
# direct-space cutoff). If the drift tracks the discontinuity size, the
# PME real-space truncation is the driver.
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --ewald-tol 1e-5
echo "TRIAGE2+L DONE" >&2
