#!/bin/bash
# Flagship run 915: the decay-mechanism A/B (round-5 item 2, step 2).
# 914 (= 912 + --diag) pinned the late decay: post-peak deterministic-test
# return correlates 0.92 with -|value bias| (V(s0) vs realized return in
# scaled units), and the policy mean inflates 0.66 -> 4.5 rms while sigma
# sits at its cap — the critic random-walks (with gamma=1.0 the retrace
# refresh has NO contraction: a uniform value error reproduces itself
# exactly in its own targets), its advantage noise pushes |mu| into action
# saturation, and REFER's trust region tracks the walk.  915 = 914 with
# gamma=0.995: the discount restores target contraction (uniform error
# decays by (1-gamma*rho_bar) per backup) at <3% per-step objective
# distortion.  Korali-exact remains gamma=1.0 (`--gamma 1.0`).
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[915] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[915] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_915.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --gamma 0.995 --diag --run 915
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_915_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --gamma 0.995 --run 915 --test --testepisodes 8
    run_stage test_best runs/flagship_915_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --gamma 0.995 --run 915 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
echo "FLAGSHIP915_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
