#!/bin/bash
# D-NeRF quality mini-sweep on CPU (claim-safe: axon never registered).
# Small proxy budget (64px / 1024 rays / 800 steps) to rank the knobs
# cheaply; the winning config then runs at the full dnerf_2k budget.
#
#   nohup bash scripts/run_dnerf_cpu_sweep.sh &
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export NERFACC_PLATFORM=cpu
export JAX_PLATFORMS=cpu
mkdir -p .bench_logs

BASE=(examples/train_mlp_dnerf.py --max_steps 800 --num_rays 1024
      --image_size 64 --grid_resolution 64 --samples_budget 32768
      --test_chunk_size 2048 --eval_views 2)

run() {
  local name=$1; shift
  [ -f ".bench_logs/$name.ok" ] && return 0
  echo "=== $name start $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS timeout 7200 python "$@" \
    > ".bench_logs/$name.log" 2>&1 && touch ".bench_logs/$name.ok"
  echo "=== $name done rc=$? $(date +%H:%M:%S)"
  grep -E "PSNR|train_time" ".bench_logs/$name.log" | sed 's/^/    /'
}

run cpu_dn_base    "${BASE[@]}"
run cpu_dn_v64     "${BASE[@]}" --train_views 64
run cpu_dn_cap     "${BASE[@]}" --train_views 64 --warp_depth 6 \
                   --warp_width 128 --time_degree 8
run cpu_dn_lr      "${BASE[@]}" --train_views 64 --lr 1e-3
run cpu_dn_lr_cap  "${BASE[@]}" --train_views 64 --warp_depth 6 \
                   --warp_width 128 --time_degree 8 --lr 1e-3
# static sibling at the same proxy budget: measures the dynamic gap
run cpu_dn_static  examples/train_mlp_nerf.py --max_steps 800 \
                   --num_rays 1024 --image_size 64 --grid_resolution 64 \
                   --samples_budget 32768 --test_chunk_size 2048 \
                   --eval_views 2
echo "=== sweep done $(date +%H:%M:%S)"
