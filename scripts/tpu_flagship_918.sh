#!/bin/bash
# Flagship run 918-marl: 917 (trust=forward) at NE=1e6 — the budget where
# 917's deterministic-test curve plateaus (-0.091..-0.14 across gens
# 160-200) BEFORE the long-budget decay regime.  Goal: a FINAL policy
# (no --best) within ~15% of the run best, the round-2/3 standing
# criterion, at a reference-plausible budget (the reference drivers use
# NE=5e5..1e7).
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[918] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[918] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_918.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 1000000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --trust forward --diag --run 918
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_918_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --trust forward --run 918 --test --testepisodes 8
    run_stage test_best runs/flagship_918_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --trust forward --run 918 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
echo "FLAGSHIP918_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
