#!/bin/bash
# Flagship run 914 (VERDICT r4 next #2): the 912 config (straight-through
# sigma cap 1.0 + winsorized cumulative reward scale, NE=2.5e6) re-run with
# per-generation decay-phase diagnostics (--diag): V(s0) vs realized return
# in scaled units (value bias), policy-mean drift on a fixed probe batch,
# probe sigma, reward scale, replay occupancy — the instrumentation the
# round-4 verdict flagged as missing for root-causing the late decay
# (912 final deterministic -0.247 vs best checkpoint -0.131; 913 ruled out
# the sigma ceiling).
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[914] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[914] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_914.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --diag --run 914
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_914_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 914 --test --testepisodes 8
    run_stage test_best runs/flagship_914_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 914 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
echo "FLAGSHIP914_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
