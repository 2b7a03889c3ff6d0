#!/bin/bash
# Flagship run 916-marl: decay A/B #2 (round-5 item 2, step 3).
# 914 instrumented the decay; 915 (gamma=0.995) REFUTED the value-bias
# hypothesis: the discount contains the bias (|V(s0)-realized| ~13 vs 914's
# ~60) yet the test peak decays identically — so the critic's random walk is
# a correlate, not the cause.  Common to every instrumented run: decay onset
# coincides with sigma pinning at its ceiling, after which the policy mean
# inflates (||mu||_rms 0.66 -> 4.5, actions saturating) while REFER's trust
# region tracks the drift.  916 throttles exactly that channel with the
# korali-native off-policy budget: Target D 0.05 instead of 0.1
# (run-vracer-burger.py:165 "Off Policy Target") — halving the allowed
# policy motion per replay lifetime.  Config otherwise identical to 912/914.
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[916] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[916] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_916.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --offtarget 0.05 --diag --run 916
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_916_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --offtarget 0.05 --run 916 --test --testepisodes 8
    run_stage test_best runs/flagship_916_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --offtarget 0.05 --run 916 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
echo "FLAGSHIP916_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
