#!/bin/bash
# KS MARL probe (SUPPLEMENTARY, beyond the reference's single-agent driver):
# 32 agents x 1 action each share the spectral reward — the same d=1
# experience shape as the burger flagship, testing whether KS closure
# learning is unlocked by per-agent experiences where the 32-dim joint
# single-agent policy (917-919) only approaches the uncontrolled baseline.
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[920] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[920] stage $name rc=${RC[$name]}" >&2
}
run_stage train runs/ks_920.log \
    python -m marlpde_tpu.run ks --NE 1000000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 --iex 0.01 \
        --nagents 32 --run 920
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/ks_920_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --iex 0.01 --nagents 32 \
            --run 920 --test --testepisodes 8
else
    RC[test]=125
fi
echo "KS920_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}}"
