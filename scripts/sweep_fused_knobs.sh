#!/bin/bash
# Sweep the fused-block kernel layout knobs on the real chip (backbone
# fwd+bwd, B=16 @224 — the round-2 measurement config where XLA=22.0ms and
# fused default=16.7ms). Env seeds SwinConfig (config._env_int), so each
# child process traces with its own layout. One variant at a time: the
# tunnel serves a single chip.
cd "$(dirname "$0")/.."
for v in \
  "TWMM=2 HG=3 GSTEP=32 DIMSEM=parallel" \
  "TWMM=2 HG=3 GSTEP=32 DIMSEM=arbitrary" \
  "TWMM=2 HG=3 GSTEP=64 DIMSEM=parallel" \
  "TWMM=2 HG=3 GSTEP=48 DIMSEM=parallel" \
  "TWMM=2 HG=3 GSTEP=16 DIMSEM=parallel" \
  "TWMM=4 HG=3 GSTEP=32 DIMSEM=parallel" \
  "TWMM=8 HG=3 GSTEP=32 DIMSEM=parallel" \
  "TWMM=1 HG=3 GSTEP=32 DIMSEM=parallel" \
  "TWMM=2 HG=1 GSTEP=32 DIMSEM=parallel" \
  "TWMM=2 HG=6 GSTEP=32 DIMSEM=parallel" \
  "TWMM=4 HG=3 GSTEP=64 DIMSEM=parallel" \
  ; do
  eval $v
  echo "=== TWMM=$TWMM HG=$HG GSTEP=$GSTEP DIMSEM=$DIMSEM"
  ESVIT_FB_TWMM=$TWMM ESVIT_FB_HG=$HG ESVIT_FB_GSTEP=$GSTEP \
  ESVIT_FB_DIMSEM=$DIMSEM ESVIT_COMPILE_CACHE=off \
    timeout 900 python scripts/perf_probe.py --batch 16 --res 224 \
    --layout_opt 2>&1 | grep -v WARNING | tail -3
done
