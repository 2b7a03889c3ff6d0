#!/bin/bash
# Round-4 flagship take 2 (run 911): the 910 A/B showed the VALUE-leaky sigma
# cap lets the REFER ratchet climb the 5% slope (sigma 0.18 -> 7.7 over 260
# generations, collection destroyed, cumulative rew_scale inflated 20x by the
# degraded episodes' large rewards — _result_burger-marl_910/history.json).
# 911 = same config with the STRAIGHT-THROUGH cap (forward exactly
# min(sigma, cap), backward keeps the 5% recovery slope).
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[pipeline] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[pipeline] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_911.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --run 911
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_911_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 911 --test --testepisodes 8
    run_stage test_best runs/flagship_911_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 911 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
fail=0; status="{"
for k in train test test_best; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
echo "PIPELINE_R4C_STATUS ${status%, }}"
exit $fail
