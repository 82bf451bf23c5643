#!/bin/bash
# Cone-angle quality A/B on CPU (VERDICT #5): the closed-form lattice
# march documents one divergence from the reference (no step-clock reset
# inside skipped space, nerfacc_tpu/ray_marching.py module docstring).
# This measures its end quality cost: same config, cone_angle 0 vs the
# reference's default 0.004. Parity (or better, given cone marching
# spends fewer samples) = the divergence is quality-neutral here.
#
# Waits for the D-NeRF mini-sweep to release the single CPU core.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export NERFACC_PLATFORM=cpu
export JAX_PLATFORMS=cpu
mkdir -p .bench_logs

while pgrep -f run_dnerf_cpu_sweep.sh > /dev/null 2>&1; do sleep 60; done

CONE=(examples/train_ngp_nerf.py --model tensorf --num_rays 4096
      --image_size 96 --grid_resolution 96 --samples_budget 131072
      --visible_samples_budget 65536 --test_chunk_size 2048
      --eval_views 2 --coarse_stride 16 --probe_groups 32
      --max_steps 1000)

run() {
  local name=$1; shift
  [ -f ".bench_logs/$name.ok" ] && return 0
  echo "=== $name start $(date +%H:%M:%S)"
  env -u PALLAS_AXON_POOL_IPS timeout 14400 python "$@" \
    > ".bench_logs/$name.log" 2>&1 && touch ".bench_logs/$name.ok"
  echo "=== $name done rc=$? $(date +%H:%M:%S)"
  grep -E "PSNR|train_time" ".bench_logs/$name.log" | sed 's/^/    /'
}

run cpu_cone_base "${CONE[@]}"
run cpu_cone_004  "${CONE[@]}" --cone_angle 0.004
echo "=== cone A/B done $(date +%H:%M:%S)"
