#!/bin/bash
# Round-3 TPU pipeline, part 2 (run after tpu_pipeline_r3.sh):
#   1. KS flagship 906 with --fused (the axon backend rejects the KS
#      program's trajectory-array D2H readback that realexp accounting
#      needs; the fused generation keeps all stats on device — KS episodes
#      are fixed-length so padded accounting is exact unless an episode
#      blows up)
#   2. KS test mode
#   3. flagship 909: tightened sigma ceiling min(half-range, 10*iex)=1.0
#   4. 909 test mode
set -x
cd /root/repo

python -m marlpde_tpu.run ks --NE 500000 --numenvs 10 --maxupd 1000 \
    --fused --testfreq 10 --testepisodes 8 --run 906 \
    > runs/ks_906b.log 2>&1

python -m marlpde_tpu.run ks --run 906 --test --testepisodes 8 \
    > runs/ks_906_test.log 2>&1

MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"
python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
    --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 --run 909 \
    > runs/flagship_909.log 2>&1

python -m marlpde_tpu.run burger-marl $MARL --run 909 --test --testepisodes 8 \
    > runs/flagship_909_test.log 2>&1

echo PIPELINE_B_DONE
