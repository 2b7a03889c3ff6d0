#!/bin/bash
# Round-3 sequential TPU pipeline (one TPU process at a time, never killed):
#   1. flagship 907 test-mode artifacts (trained under the sigma cap only)
#   2. flagship 908: korali economics + jeffreys trust region + blowup-proof
#      reward scale — the VERDICT item-2 rerun
#   3. 908 test mode
#   4. KS flagship 906 (NE=5e5) + test mode — VERDICT item 3
#   5. bench variants: flagship train mode, burger-fd, ks — VERDICT item 5
set -x
cd /root/repo

MARL="--nagents 32 --specreward --dforce --ic turbulence --width 128 --iex 0.1"

python -m marlpde_tpu.run burger-marl $MARL --run 907 --test --testepisodes 8 \
    > runs/flagship_907_test.log 2>&1

python -m marlpde_tpu.run burger-marl $MARL --NE 2500000 --numenvs 10 \
    --mbsize 8 --maxupd 2500 --testfreq 10 --testepisodes 8 --run 908 \
    > runs/flagship_908.log 2>&1

python -m marlpde_tpu.run burger-marl $MARL --run 908 --test --testepisodes 8 \
    > runs/flagship_908_test.log 2>&1

python -m marlpde_tpu.run ks --NE 500000 --numenvs 10 --maxupd 1000 \
    --testfreq 10 --testepisodes 8 --run 906 \
    > runs/ks_906.log 2>&1

python -m marlpde_tpu.run ks --run 906 --test --testepisodes 8 \
    > runs/ks_906_test.log 2>&1

BENCH_MODE=train python bench.py > results/BENCH_TRAIN_r3.json 2> runs/bench_train_r3.log
BENCH_WORKLOAD=burger-fd BENCH_ENVS=2048 BENCH_MACRO=50 python bench.py \
    > results/BENCH_FD_r3.json 2> runs/bench_fd_r3.log
BENCH_WORKLOAD=ks BENCH_ENVS=2048 BENCH_MACRO=50 python bench.py \
    > results/BENCH_KS_r3.json 2> runs/bench_ks_r3.log

echo PIPELINE_DONE
