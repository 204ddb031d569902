#!/usr/bin/env bash
# Preprocessing driver — counterpart of the reference scripts/preprocess/preprocess.sh.
#   bash scripts/preprocess.sh flow   <rgb_dir> <save_dir> [interval ...]   # RAFT fwd/bwd flow + occlusion
#   bash scripts/preprocess.sh mask   <rgb_dir> <flow_dir> <save_dir>       # epipolar-flow geometric masks
#   bash scripts/preprocess.sh colmap <rgb_dir> <work_dir>                  # COLMAP SfM + poses_bounds.npy
#   bash scripts/preprocess.sh depth-align <zoe_dir> <colmap_dir> <save_dir> # ZoeDepth scale/shift alignment
#   bash scripts/preprocess.sh zoe <rgb_dir> <mvs_dir> <pred_dir> <save_dir>  # full zoe npz layout
#   bash scripts/preprocess.sh convert-casual-sam <base> <rgb_dir> <save>   # consistent-depth converters
#   bash scripts/preprocess.sh convert-dvd <base> <rgb_dir> <save>
# Unlike the reference (which clones 9 third-party repos), flow runs the
# native RAFT port (needs raft-things.pth under PGDVS_CKPT_DIR); OneFormer/
# SAM semantic masks remain precomputed inputs (the released-data path).
set -euo pipefail
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
CMD=${1:?command}; shift

case "${CMD}" in
  flow)
    exec python -m pgdvs_tpu.preprocess.compute_flow --rgb-dir "$1" --save-dir "$2" "${@:3}" ;;
  mask)
    exec python -m pgdvs_tpu.preprocess.epipolar_mask --rgb-dir "$1" --flow-dir "$2" --save-dir "$3" "${@:4}" ;;
  colmap)
    exec python -m pgdvs_tpu.preprocess.colmap_driver --rgb-dir "$1" --work-dir "$2" "${@:3}" ;;
  depth-align)
    exec python -m pgdvs_tpu.preprocess.depth_align --zoe-dir "$1" --colmap-dir "$2" --save-dir "$3" "${@:4}" ;;
  zoe)
    # full zoe pipeline: align precomputed metric-depth predictions to MVS
    # depth and write the dense/zoe_depths_<type>/ npz layout
    exec python -m pgdvs_tpu.preprocess.compute_zoedepth --rgb-dir "$1" --mvs-depth-dir "$2" --pred-dir "$3" --save-dir "$4" "${@:5}" ;;
  convert-casual-sam)
    exec python -m pgdvs_tpu.preprocess.depth_converters casual_sam --base-dir "$1" --rgb-dir "$2" --save-dir "$3" ;;
  convert-dvd)
    exec python -m pgdvs_tpu.preprocess.depth_converters dyn_video_depth --base-dir "$1" --rgb-dir "$2" --save-dir "$3" ;;
  *) echo "unknown command ${CMD}"; exit 1 ;;
esac
