#!/bin/bash
# Burgers closure training launcher — the runs/burger_launcher.sh equivalent:
# pins hyperparameters, archives provenance (script self-copy + git diff),
# runs training then evaluation, then plots training curves.

set -euo pipefail

RUN=${RUN:-0}
N=${N:-32}
NA=${NA:-32}
NDNS=${NDNS:-512}
NE=${NE:-500000}
WIDTH=${WIDTH:-256}
IEX=${IEX:-0.1}
EPLEN=${EPLEN:-500}
IC=${IC:-turbulence}
NU=${NU:-0.02}
SEED=${SEED:-42}
NUMENVS=${NUMENVS:-16}
EXTRA=${EXTRA:-"--specreward"}

RESULT="_result_burger_${RUN}"
mkdir -p "$RESULT"
# provenance (runs/burger_launcher.sh:42-48)
cp "$0" "$RESULT/launcher_${RUN}.sh"
git -C "$(dirname "$0")/.." diff > "$RESULT/gitdiff_${RUN}.txt" 2>/dev/null || true
git -C "$(dirname "$0")/.." rev-parse HEAD > "$RESULT/githash_${RUN}.txt" 2>/dev/null || true

python -m marlpde_tpu.run burger \
    --NDNS "$NDNS" --N "$N" --NA "$NA" --NE "$NE" --width "$WIDTH" \
    --iex "$IEX" --episodelength "$EPLEN" --ic "$IC" --nu "$NU" \
    --seed "$SEED" --numenvs "$NUMENVS" --run "$RUN" $EXTRA

python -m marlpde_tpu.run burger \
    --NDNS "$NDNS" --N "$N" --NA "$NA" --width "$WIDTH" \
    --iex "$IEX" --episodelength "$EPLEN" --ic "$IC" --nu "$NU" \
    --seed "$SEED" --run "$RUN" $EXTRA --test

python -m marlpde_tpu.analysis.rlview --dir "_result_burger_${RUN}" \
    --out "$RESULT/training_curves.png"
