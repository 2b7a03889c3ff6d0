#!/bin/bash
# KS exploration-calibration probe (SUPPLEMENTARY, config-deviant and
# labeled as such): the reference's iex=1e-3 bounds the reachable forcing to
# a few 1e-3 — runs 917/918 converge to near-do-nothing (-0.0165) without
# beating the uncontrolled baseline (-0.0068).  919 raises iex to 1e-2 to
# test whether the useful KS closure amplitude is simply out of reach of the
# reference exploration scale.  The reference repo ships no KS results to
# compare against (SURVEY.md §6).
set -uo pipefail
cd /root/repo
while pgrep -f 'tpu_queue_r4e.sh' > /dev/null; do sleep 30; done
sleep 60
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[919] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[919] stage $name rc=${RC[$name]}" >&2
}
run_stage ks919_train runs/ks_919.log \
    python -m marlpde_tpu.run ks --NE 1000000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 --iex 0.01 \
        --muparam sigma_relative --dimnorm --run 919
if [ "${RC[ks919_train]}" -eq 0 ]; then
    run_stage ks919_test runs/ks_919_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --iex 0.01 \
            --muparam sigma_relative --dimnorm --run 919 --test --testepisodes 8
else
    RC[ks919_test]=125
fi
echo "KS919_STATUS {\"train\": ${RC[ks919_train]}, \"test\": ${RC[ks919_test]}}"
