#!/bin/bash
# Wave 3: attribute the +575 K/ns no-elec drift (1b/disp vs 2B vs 3B vs
# PIP gradient precision), then chip force-noise measurement.
cd /root/repo
OUT=artifacts/drift_triage3_r05.jsonl
: > $OUT
while kill -0 $(cat /tmp/drift_triage2.pid) 2>/dev/null; do sleep 20; done
run() {
  echo "=== ARM3: $* ===" >&2
  timeout 3600 python tools/nve_drift.py --therm 2000 --seg 1000 "$@" >> $OUT 2>/tmp/drift_arm3_err.log \
    || echo "{\"error\": \"arm failed: $*\"}" >> $OUT
}
# M: no-elec with PIP gradient at HIGHEST
MBPOL_PIP_GRAD_PREC=highest run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --terms one_body,two_body,three_body,dispersion
# N: no PIP terms at all (1b + switched dispersion)
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --terms one_body,dispersion
# O: add 2B only
run --steps 50000 --aspc-k 3 --n-corr 1 --disp-switch 0.1 --kahan --terms one_body,two_body,dispersion
# then the chip force-noise measurement (oracle must exist by then)
timeout 1800 python tools/term_force_noise.py > artifacts/term_force_noise_r05.json 2>/tmp/tfn_err.log
echo "TRIAGE3 DONE" >&2
