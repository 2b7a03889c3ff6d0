#!/bin/bash
# KS exploration-scale probe, step 3 (supplementary): controlled results are
# monotone in iex (1e-3: -0.0165 @ NE=2e6; 1e-2: -0.0151 @ NE=1e6) while the
# uncontrolled baseline sits at -0.0068.  921 probes iex=0.1 — exploration
# noise hurts collection but the deterministic test uses mu only.
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[921] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[921] stage $name rc=${RC[$name]}" >&2
}
run_stage train runs/ks_921.log \
    python -m marlpde_tpu.run ks --NE 1000000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 --iex 0.1 \
        --run 921
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/ks_921_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --iex 0.1 --run 921 \
            --test --testepisodes 8
else
    RC[test]=125
fi
echo "KS921_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}}"
