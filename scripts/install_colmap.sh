#!/usr/bin/env bash
# Build & install COLMAP from source — analog of the reference's
# scripts/preprocess/install_colmap.sh (whose recipe derives from
# consistent_depth's installer). The framework's COLMAP driver
# (pgdvs_tpu/preprocess/colmap_driver.py) shells out to the `colmap`
# binary this script provides; on clusters with a packaged colmap module
# just `module load colmap` instead.
#
#   bash scripts/install_colmap.sh <install_root> [colmap_tag]
set -euo pipefail

BASE_DIR=${1:?install root}
COLMAP_TAG=${2:-3.8}
mkdir -p "${BASE_DIR}"

if command -v apt-get >/dev/null 2>&1; then
    sudo apt-get update
    # colmap.github.io/install.html dependency set
    sudo apt-get install -y \
        git cmake ninja-build build-essential \
        libboost-program-options-dev libboost-filesystem-dev \
        libboost-graph-dev libboost-system-dev libboost-test-dev \
        libeigen3-dev libflann-dev libfreeimage-dev libmetis-dev \
        libgoogle-glog-dev libgflags-dev libsqlite3-dev libglew-dev \
        qtbase5-dev libqt5opengl5-dev libcgal-dev libceres-dev \
        libatlas-base-dev libsuitesparse-dev
fi

cd "${BASE_DIR}"
[ -d colmap ] || git clone https://github.com/colmap/colmap.git
cd colmap
git fetch --tags && git checkout "${COLMAP_TAG}"
mkdir -p build && cd build
# CUDA_ENABLED auto-detects; pass -DCUDA_ENABLED=OFF for CPU-only boxes
cmake .. -GNinja -DCMAKE_INSTALL_PREFIX="${BASE_DIR}/colmap_install"
ninja
ninja install

echo "colmap installed at ${BASE_DIR}/colmap_install/bin/colmap"
echo "add to PATH: export PATH=${BASE_DIR}/colmap_install/bin:\$PATH"
