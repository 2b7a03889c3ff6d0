#!/bin/bash
# KS run 922: oracle-calibrated exploration scale (round-5 item 1).
# scripts/ks_oracle.py + ks_env_opt.py established: (a) real headroom at
# N=32 (oracle@macro -0.00127, realizable hyperviscosity feedback -0.00104,
# vs uncontrolled -0.00543), (b) the optimal forcing has rms 3.3e-3 — so the
# right iex is ~3e-3 (near the reference's 1e-3), NOT the aborted probe
# 921's 0.1 (30x too coarse) and not 919's 1e-2 (noise 3x the entire
# subgrid term).  sigma_relative + dimnorm are the ks scale_robust defaults.
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[922] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[922] stage $name rc=${RC[$name]}" >&2
}
run_stage train runs/ks_922.log \
    python -m marlpde_tpu.run ks --NE 2000000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 --iex 0.003 \
        --run 922
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/ks_922_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --iex 0.003 --run 922 \
            --test --testepisodes 8
else
    RC[test]=125
fi
echo "KS922_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}}"
