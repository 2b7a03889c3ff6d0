#!/bin/bash
# Waits for the flagship-912 pipeline to release the TPU, then runs:
#   1. KS 918: NE=2e6 with the round-4 scale fixes (917 showed a healthy
#      regulator and -0.035 -> -0.016 in 100 gens; 918 extends 4x)
#   2. diffusion-simple 980: the REFERENCE-DEFAULT config (N=128, 1 agent,
#      episodeLength 500) with --dimnorm --muparam sigma_relative at TPU
#      speed — the SURVEY §7 acceptance run, expected slow-velocity trend
#      (docs/REFER_SCALE.md pathology 2)
#   3. diffusion-simple 980 --test (error_rl_128.json + evolution panels)
set -uo pipefail
cd /root/repo
# wait for the WHOLE 912 pipeline (train + both test stages), not just train
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
run_stage diff980_train runs/diffusion_980.log \
    python -m marlpde_tpu.run diffusion-simple --NE 250000 --numenvs 10 \
        --dimnorm --muparam sigma_relative --testfreq 100 --testepisodes 5 \
        --run 980
if [ "${RC[diff980_train]}" -eq 0 ]; then
    run_stage diff980_test runs/diffusion_980_test.log \
        python -m marlpde_tpu.run diffusion-simple --dimnorm \
            --muparam sigma_relative --run 980 --test
else
    RC[diff980_test]=125
fi
fail=0; status="{"
for k in ks918_train ks918_test diff980_train diff980_test; do
    status+="\"$k\": ${RC[$k]:-none}, "
    [ "${RC[$k]:-1}" -ne 0 ] && fail=1
done
echo "QUEUE_R4E_STATUS ${status%, }}"
exit $fail
