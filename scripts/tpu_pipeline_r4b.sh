#!/bin/bash
# Round-4 TPU pipeline B: flagship peak-holding A/B + the burger-fd bench.
#
#   1. flagship 910 = run-909 config (VERDICT r3 item 3) + the round-4 fixes:
#      leaky sigma ceiling (networks.leaky_sigma_cap — 909's hard cap had zero
#      gradient above 1.0 and sigma rode it all run) and the cumulative
#      reward-scale source (909's live-buffer scale swung 0.0122->0.0043->
#      0.0098, spiking v_loss 32/11.6/14.6; results/flagship_r3/summary.json).
#   2. 910 test mode (final policy) + --best (peak policy) — the peak-holding
#      criterion is final within noise of best.
#   3. burger-fd bench with the per-frame pool gathers (round-3 OOM'd on
#      whole-row gathers at B=2048; runs/bench_fd_r3.log).
#
# Same loud-failure policy as tpu_pipeline_r4a.sh.
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

run_stage train runs/flagship_910.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --run 910

if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_910_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 910 --test --testepisodes 8
    run_stage test_best runs/flagship_910_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --run 910 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi

BENCH_WORKLOAD=burger-fd BENCH_ENVS=2048 BENCH_MACRO=50 run_stage fd_bench \
    runs/bench_fd_r4.log python bench.py
if [ "${RC[fd_bench]}" -eq 0 ]; then
    grep -h '^{' runs/bench_fd_r4.log | tail -1 > results/BENCH_FD_r4.json
fi
if [ ! -s results/BENCH_FD_r4.json ]; then
    echo "{\"error\": \"fd bench produced no JSON (rc=${RC[fd_bench]})\"}" \
        > results/BENCH_FD_r4.json
fi

fail=0
status="{"
for k in train test test_best fd_bench; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
status="${status%, }}"
echo "PIPELINE_R4B_STATUS $status"
exit $fail
