#!/bin/bash
# KS round-4 take 2: run 916 (korali-faithful absolute mu + fixed cutoff)
# proved the TPU path but the policy lost to uncontrolled by 5 orders of
# magnitude (runs/ks_916_test.log: controlled -522.7 vs baseline -0.0068) —
# the REFER scale pathologies measured there motivate the two round-4 knobs:
#   --muparam sigma_relative : zero-init mean (starts AT the uncontrolled
#       baseline), policy motion proportional to sigma (iex=1e-3)
#   --dimnorm                : sqrt(32)-normalized off-policy cutoff
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
run_stage ks_train runs/ks_917.log \
    python -m marlpde_tpu.run ks --NE 500000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 \
        --muparam sigma_relative --dimnorm --run 917
if [ "${RC[ks_train]}" -eq 0 ]; then
    run_stage ks_test runs/ks_917_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --muparam sigma_relative \
            --dimnorm --run 917 --test --testepisodes 8
else
    RC[ks_test]=125
fi
fail=0; status="{"
for k in ks_train ks_test; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
echo "PIPELINE_KS917_STATUS ${status%, }}"
exit $fail
