#!/usr/bin/env bash
# Local smoke pre-training (the reference's scripts_local/run_ssl_imagenet.sh
# analogue): short runs of each backbone family on synthetic data.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/esvit_smoke}
COMMON=(--data_kind synthetic --epochs 1 --max_steps 3
        --batch_size_per_device 4 --out_dim 1024
        --local_crops_number 4)

for arch in swin_tiny cvt_tiny vil_tiny deit_small; do
  echo "=== $arch ==="
  python -m esvit_tpu.train.train --arch "$arch" \
      --output_dir "$OUT/$arch" "${COMMON[@]}"
done
echo "all smoke runs done -> $OUT"
