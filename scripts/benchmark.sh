#!/usr/bin/env bash
# Benchmark driver — same surface as the reference scripts/benchmark.sh:
#   bash scripts/benchmark.sh <data_root> <ckpt_root> <dataset> '[SceneA,SceneB]' <benchmark_type> [extra run.py args...]
# e.g.
#   bash scripts/benchmark.sh /data /ckpts nvidia '[Balloon1]' default
#   bash scripts/benchmark.sh /data /ckpts nvidia '[Balloon1]' st_cvd_dy_cvd
#   bash scripts/benchmark.sh /data /ckpts dycheck_iphone '[apple]' default
set -euo pipefail

DATA_ROOT=${1:?data root}
CKPT_ROOT=${2:?checkpoint root}
DATASET=${3:?dataset: nvidia | dycheck_iphone}
SCENE_IDS=${4:?scene ids, e.g. '[Balloon1]'}
RUN_TYPE=${5:-default}
shift 5 || true

export PGDVS_CKPT_DIR="${CKPT_ROOT}"

# strip brackets: '[A,B]' -> 'A B'
SCENES=$(echo "${SCENE_IDS}" | tr -d '[]' | tr ',' ' ')

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
OUT_DIR="${REPO_DIR}/experiments/$(date +%Y%m%d_%H%M%S)_${DATASET}_${RUN_TYPE}"

exec python "${REPO_DIR}/run.py" benchmark \
    --benchmark-type "${RUN_TYPE}" \
    --dataset-family "${DATASET}" \
    --data-root "${DATA_ROOT}" \
    --scene-ids ${SCENES} \
    --out-dir "${OUT_DIR}" \
    "$@"
