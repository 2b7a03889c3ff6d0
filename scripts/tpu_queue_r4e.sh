#!/bin/bash
# TPU queue after the flagship-912 pipeline:
#   1. KS 918: NE=2e6 with the round-4 scale fixes (917: healthy regulator,
#      -0.035 -> -0.016 in 100 gens; 918 extends 4x toward beating the
#      uncontrolled baseline's -0.0068)
#   2. flagship 913: 912 config (straight-through cap held at 1.0; winsor
#      kept rew_scale sane at 0.0168 vs 911's 0.87) but --sigma-max 0.3 —
#      912's tests peak at -0.131 while sigma is in 0.2..0.6 and degrade to
#      -0.4..-0.5 once sigma rides the 1.0 cap; the round-3 A/B already
#      located the productive band at sigma = O(iex).
# (diffusion moved to CPU: at eplen~9 the unfused CPU path outpaces the
#  tunnel; run 981 carries the full reference NE=1e6 budget.)
set -uo pipefail
cd /root/repo
while pgrep -f 'tpu_pipeline_r4d.sh' > /dev/null; do sleep 30; done
sleep 60   # let the tunnel claim clear
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[queue] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[queue] stage $name rc=${RC[$name]}" >&2
}
run_stage ks918_train runs/ks_918.log \
    python -m marlpde_tpu.run ks --NE 2000000 --numenvs 10 --maxupd 1000 \
        --fused --testfreq 10 --testepisodes 8 --sigma-max 5 \
        --muparam sigma_relative --dimnorm --run 918
if [ "${RC[ks918_train]}" -eq 0 ]; then
    run_stage ks918_test runs/ks_918_test.log \
        python -m marlpde_tpu.run ks --sigma-max 5 --muparam sigma_relative \
            --dimnorm --run 918 --test --testepisodes 8
else
    RC[ks918_test]=125
fi
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage f913_train runs/flagship_913.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --sigma-max 0.3 --run 913
if [ "${RC[f913_train]}" -eq 0 ]; then
    run_stage f913_test runs/flagship_913_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --sigma-max 0.3 --run 913 --test --testepisodes 8
    run_stage f913_test_best runs/flagship_913_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --sigma-max 0.3 --run 913 --test --best --testepisodes 8
else
    RC[f913_test]=125; RC[f913_test_best]=125
fi
fail=0; status="{"
for k in ks918_train ks918_test f913_train f913_test f913_test_best; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
echo "QUEUE_R4E_STATUS ${status%, }}"
exit $fail
