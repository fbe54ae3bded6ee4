#!/bin/bash
# CFEAR-3-s50 keyframe-gate sweep: fps + drift vs max_active_keyframes.
#
# The s50 association/LM cost is linear in the ACTIVE keyframe axis; the
# VERDICT r2 target is >= 200 fps single-sequence at unchanged drift
# (0.060%). Each K compiles a distinct program (the gated window reshapes
# to (K, M, ...)) — first runs take minutes through the remote compiler.
# Serialize: the TPU tunnel is single-tenant.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
out="${1:-/tmp/s50_gate_sweep.log}"
: > "$out"
for k in 0 24 16 12; do
  echo "=== max_active_keyframes=$k ===" >> "$out"
  timeout 3000 python bench.py --preset CFEAR-3-s50 --check-drift \
    --batch 4 --frames 96 --chunk 32 --max-active-keyframes "$k" \
    >> "$out" 2>&1
  echo "exit=$?" >> "$out"
done
