#!/bin/bash
# Round-4 TPU pipeline A: the KS workload end-to-end (train -> test -> bench).
# Unblocked by the rule-8 fix (docs/TPU_NOTES.md): host-built DNS pool +
# matmul-rfft LES; probe evidence in runs/tpu_fft_probe_r4.log +
# runs/ks_env_probe_r4.log.
#
# Failure policy (VERDICT r3 weak #5): every stage's rc is captured; a failed
# stage aborts dependent stages; the final line is a JSON status map and the
# exit code is non-zero if ANY stage failed.  Empty outputs are replaced by
# {"error": ...} rather than committed as empty files.
set -uo pipefail
cd /root/repo

declare -A RC

run_stage() {  # name, logfile, cmd...
    local name="$1" log="$2"; shift 2
    echo "[pipeline] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[pipeline] stage $name rc=${RC[$name]}" >&2
}

# 1. KS flagship: reference run-vracer-ks.py economics (NDNS=1024, N=NA=32,
#    iex=1e-3, NE=5e5), fused generations, sigma ceiling at half action range
#    (the 10x-iex default is 0.01 here — untested on KS, too tight a prior).
run_stage ks_train runs/ks_916.log \
    python -m marlpde_tpu.run ks --NE 500000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 --run 916

# 2. KS test mode (ks_environment.py:122-183: controlled npz + DNS SGS terms
#    + uncontrolled baseline + makePlot)
if [ "${RC[ks_train]}" -eq 0 ]; then
    run_stage ks_test runs/ks_916_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --run 916 --test --testepisodes 8
else
    RC[ks_test]=125  # skipped
fi

# 3. KS bench variant (general vmapped env + policy in loop)
BENCH_WORKLOAD=ks BENCH_ENVS=2048 BENCH_MACRO=50 run_stage ks_bench \
    runs/bench_ks_r4.log python bench.py
if [ "${RC[ks_bench]}" -eq 0 ] && [ -s runs/bench_ks_r4.log ]; then
    # bench prints the JSON line on stdout -> captured into the log; extract it
    grep -h '^{' runs/bench_ks_r4.log | tail -1 > results/BENCH_KS_r4.json
fi
if [ ! -s results/BENCH_KS_r4.json ]; then
    echo "{\"error\": \"ks bench produced no JSON (rc=${RC[ks_bench]})\"}" \
        > results/BENCH_KS_r4.json
fi

fail=0
status="{"
for k in ks_train ks_test ks_bench; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
status="${status%, }}"
echo "PIPELINE_R4A_STATUS $status"
exit $fail
