#!/bin/bash
# MARL Burgers launcher (runs/burger_marl_launcher.sh equivalent).
set -euo pipefail
RUN=${RUN:-0}
NAGENTS=${NAGENTS:-32}
EXTRA=${EXTRA:-"--specreward"}
RESULT="_result_burger-marl_${RUN}"
mkdir -p "$RESULT"
cp "$0" "$RESULT/launcher_${RUN}.sh"
git -C "$(dirname "$0")/.." diff > "$RESULT/gitdiff_${RUN}.txt" 2>/dev/null || true

python -m marlpde_tpu.run burger-marl \
    --nagents "$NAGENTS" --N "${N:-32}" --NA "${NA:-32}" --NE "${NE:-500000}" \
    --episodelength "${EPLEN:-500}" --ic "${IC:-turbulence}" \
    --mar "${MAR:-individual}" --run "$RUN" $EXTRA
python -m marlpde_tpu.analysis.rlview --dir "$RESULT" --out "$RESULT/training_curves.png"
