#!/usr/bin/env bash
# Visualization driver — same surface as the reference scripts/visualize.sh:
#   bash scripts/visualize.sh <data_root> <ckpt_root> <dataset> <scene_id> [extra run.py args...]
# dataset: nvidia_vis | mono_vis
# Renders an interpolated space-time (bullet-time) trajectory and assembles
# an mp4 (reference visualize.sh:40-80; vis_specifics defaults mirrored by
# run.py vis flags).
set -euo pipefail

DATA_ROOT=${1:?data root}
CKPT_ROOT=${2:?checkpoint root}
DATASET=${3:?dataset: nvidia_vis | mono_vis}
SCENE_ID=${4:?scene id}
shift 4 || true

case "${DATASET}" in
  nvidia_vis|mono_vis) ;;
  *) echo "dataset ${DATASET} is NOT supported (nvidia_vis | mono_vis)"; exit 1 ;;
esac

export PGDVS_CKPT_DIR="${CKPT_ROOT}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
OUT_DIR="${REPO_DIR}/experiments/$(date +%Y%m%d_%H%M%S)_vis_${DATASET}_${SCENE_ID}"

exec python "${REPO_DIR}/run.py" vis \
    --dataset "${DATASET}" \
    --data-root "${DATA_ROOT}" \
    --scene-ids "${SCENE_ID}" \
    --out-dir "${OUT_DIR}" \
    "$@"
