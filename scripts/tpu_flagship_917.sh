#!/bin/bash
# Flagship run 917-marl: decay A/B #3 (round-5 item 2, step 4).
# With sigma ceiling (913), value bias (915), and off-policy budget (916)
# eliminated, the surviving mechanism is policy-mean inflation with REFER's
# trust region tracking the inflating behavior policy.  The far-policy
# penalty's DIVERGENCE controls how that tracking behaves: the default
# jeffreys (symmetrized) penalty is mode-seeking in neither direction,
# while the pure forward KL(behavior || current) punishes the current
# policy for abandoning behavior mass — a different pull on a drifting
# mean.  917 = 914 with --trust forward; korali's own choice of divergence
# is not documented in the reference repo (the C++ is external), so this
# doubles as a fidelity probe.  Config otherwise identical to 912/914.
set -uo pipefail
cd /root/repo
declare -A RC
run_stage() {
    local name="$1" log="$2"; shift 2
    echo "[917] stage $name: $*" >&2
    "$@" > "$log" 2>&1
    RC[$name]=$?
    echo "[917] stage $name rc=${RC[$name]}" >&2
}
MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
run_stage train runs/flagship_917.log \
    python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
        --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 \
        --rscale cumulative --trust forward --diag --run 917
if [ "${RC[train]}" -eq 0 ]; then
    run_stage test runs/flagship_917_test.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --trust forward --run 917 --test --testepisodes 8
    run_stage test_best runs/flagship_917_test_best.log \
        python -m marlpde_tpu.run burger-marl $MARL --rscale cumulative \
            --trust forward --run 917 --test --best --testepisodes 8
else
    RC[test]=125; RC[test_best]=125
fi
echo "FLAGSHIP917_STATUS {\"train\": ${RC[train]}, \"test\": ${RC[test]}, \"test_best\": ${RC[test_best]}}"
