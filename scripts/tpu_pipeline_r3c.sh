#!/bin/bash
# Round-3 TPU pipeline, part 3: bench variants with env batches sized to the
# per-env DNS-trajectory footprint (the vmapped general env materializes the
# episode's ground-truth slice per env: N_dns=1024 x ~5001 steps x 4B ~ 20 MB
# per env for burger-fd — 2048 envs OOM'd the 16 GB HBM; see
# runs/bench_fd_r3.log).
set -x
cd /root/repo
BENCH_WORKLOAD=burger-fd BENCH_ENVS=256 BENCH_MACRO=50 python bench.py \
    > results/BENCH_FD_r3.json 2> runs/bench_fd_r3.log
BENCH_WORKLOAD=ks BENCH_ENVS=128 BENCH_MACRO=50 python bench.py \
    > results/BENCH_KS_r3.json 2> runs/bench_ks_r3.log
echo PIPELINE_C_DONE
