#!/bin/bash
# Round-4 flagship take 2 (run 912): the 910 A/B showed the VALUE-leaky sigma
# cap lets the REFER ratchet climb the 5% slope (sigma 0.18 -> 7.7 over 260
# generations, collection destroyed, cumulative rew_scale inflated 20x by the
# degraded episodes' large rewards — _result_burger-marl_910/history.json).
# 912 = 911 (straight-through cap held: sigma pinned at 1.0, collection
# healthy) + winsorized cumulative reward scale: 911 was crushed by one
# generation of non-blowup reward spikes inflating the Welford scale 80x
# (rew_scale 0.011 -> 0.87, _result_burger-marl_911/history.json).
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
run_stage train runs/flagship_912.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --run 912
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_912_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 912 --test --testepisodes 8
    run_stage test_best runs/flagship_912_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 912 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
fail=0; status="{"
for k in train test test_best; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
echo "PIPELINE_R4D_STATUS ${status%, }}"
exit $fail
