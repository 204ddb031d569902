#!/usr/bin/env bash
# Checkpoint fetcher — same sources as the reference scripts/download_ckpts.sh.
#   bash scripts/download_ckpts.sh <ckpt_root> [original|mirror]
# original: per-model upstream URLs (GNT via gdown, TAPIR/CoTracker via wget)
# mirror:   the Apple release bundle pgdvs_ckpts.zip (default)
# The framework consumes the checkpoints via PGDVS_CKPT_DIR:
#   gnt/model_720000.pth, tapnet/tapir_checkpoint_panning.npy,
#   cotracker/cotracker_stride_4_wind_8.pth, raft/models/raft-things.pth,
#   alexnet.pth (LPIPS backbone; the learned LPIPS linear heads are bundled
#   in-repo at pgdvs_tpu/metrics/weights/lpips_lin_alex_v0.1.pth).
set -euo pipefail

CKPT_ROOT=${1:?checkpoint root}
MODE=${2:-mirror}
mkdir -p "${CKPT_ROOT}"

if [ "${MODE}" == "original" ]; then
    mkdir -p "${CKPT_ROOT}/gnt" "${CKPT_ROOT}/tapnet" "${CKPT_ROOT}/cotracker" "${CKPT_ROOT}/raft/models"
    [ -f "${CKPT_ROOT}/gnt/model_720000.pth" ] || \
        gdown 1AMN0diPeHvf2fw53IO5EE2Qp4os5SkoX -O "${CKPT_ROOT}/gnt/"
    [ -f "${CKPT_ROOT}/tapnet/tapir_checkpoint_panning.npy" ] || \
        wget https://storage.googleapis.com/dm-tapnet/tapir_checkpoint_panning.npy -P "${CKPT_ROOT}/tapnet/"
    [ -f "${CKPT_ROOT}/cotracker/cotracker_stride_4_wind_8.pth" ] || \
        wget https://dl.fbaipublicfiles.com/cotracker/cotracker_stride_4_wind_8.pth -P "${CKPT_ROOT}/cotracker/"
    [ -f "${CKPT_ROOT}/alexnet.pth" ] || \
        wget https://download.pytorch.org/models/alexnet-owt-7be5be79.pth -O "${CKPT_ROOT}/alexnet.pth"
else
    [ -f "${CKPT_ROOT}/pgdvs_ckpts.zip" ] || \
        wget https://github.com/apple/ml-pgdvs/releases/download/v0.1/pgdvs_ckpts.zip -P "${CKPT_ROOT}/"
    unzip -o "${CKPT_ROOT}/pgdvs_ckpts.zip" -d "${CKPT_ROOT}/"
fi
echo "checkpoints under ${CKPT_ROOT}; export PGDVS_CKPT_DIR=${CKPT_ROOT}"
