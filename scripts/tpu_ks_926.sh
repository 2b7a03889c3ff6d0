#!/bin/bash
# KS run 926: 925 at NE=1e6 — the budget where 925's pool-averaged test
# curve converged (gen ~100-125), so the FINAL policy (no --best) sits at
# the peak.  Same grid-16 / 16-row-pool operating point.
# The 16-row mean studies (scripts/ks_mean_study.py, results/
# ks_mean_study_g{32,16}_r5.json) settled the N=32 question: at the
# reference default grid NO intervention improves the pool-mean spectral
# score — not state feedback (every e4 hurts), not even the row's own exact
# a-priori SGS forcing (3/16 wins) — the uncontrolled N=32 LES already sits
# at the chaos-noise floor of the objective.  At grid 16 the LES is
# genuinely underresolved and a robust state-feedback improvement exists
# (held-out rows: -0.0225 vs uncontrolled -0.0426, 6/8 wins, with a
# one-parameter linear policy).  926 trains VRACER there over a 16-row DNS
# pool (training and testing both average over chaos draws; the --test
# harness now reports pool-averaged controlled vs uncontrolled).
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[926] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[926] stage $name rc=${RC[$name]}" >&2
}
KS="--N 16 --NA 16 --ndns 16 --sigma-max 5 --iex 0.01"
run_stage train runs/ks_926.log \
    python -m marlpde_tpu.run ks $KS --NE 1000000 --numenvs 16 \
        --maxupd 1000 --fused --testfreq 10 --testepisodes 16 --run 926
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/ks_926_test.log \
        python -m marlpde_tpu.run ks $KS --run 926 --test --testepisodes 16
    run_stage test_best runs/ks_926_test_best.log \
        python -m marlpde_tpu.run ks $KS --run 926 --test --best --testepisodes 16
else
    RC[test]=125; RC[test_best]=125
fi
echo "KS926_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
