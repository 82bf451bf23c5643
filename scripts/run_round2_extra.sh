#!/bin/bash
# Round-2 follow-up measurements (run AFTER run_round2_measurements.sh):
# the two perf experiments implemented while the first drive ran, plus a
# post-fused step-anatomy trace. Same single-claimer discipline.
#
#   nohup bash scripts/run_round2_extra.sh &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs

run() {
  local name=$1; shift
  echo "=== $name start $(date +%H:%M:%S)"
  timeout 7200 "$@" > ".bench_logs/$name.log" 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)"
  tail -2 ".bench_logs/$name.log" | sed 's/^/    /'
}

# two-stage visible re-selection in the bench (the flagship quality
# config's culling path; ~49% of one-stage slots are dead lanes)
run bench_2stage      python bench.py --visible_budget_ratio 0.5
run bench_2stage_lo   python bench.py --visible_budget_ratio 0.33

# int8-MXU CP forward
run bench_int8        python bench.py --quant_int8
run bench_int8_2stage python bench.py --quant_int8 --visible_budget_ratio 0.5

# int8 quality gate (compare against the drive's q_base1k PSNR)
run q_int8_1k python examples/train_ngp_nerf.py --model tensorf \
    --num_rays 8192 --image_size 128 --grid_resolution 128 \
    --samples_budget 393216 --visible_samples_budget 196608 \
    --test_chunk_size 4096 --eval_views 3 --coarse_stride 16 \
    --probe_groups 32 --max_steps 1000 --quant_int8

# D-NeRF: low time-degree (the GT motion is one cycle; high-frequency
# time features can only overfit the sparse train-time samples)
DN=(examples/train_mlp_dnerf.py --max_steps 2000 --num_rays 2048
    --image_size 96 --grid_resolution 96 --samples_budget 65536
    --test_chunk_size 2048 --eval_views 2)
run dn_tdeg2 python "${DN[@]}" --train_views 64 --time_degree 2
run dn_tdeg2_5k python "${DN[@]}" --max_steps 5000 --train_views 64 \
    --time_degree 2

# proposal-pipeline throughput + quality (the grid-free flagship)
run prop_2k python examples/train_proposal_nerf.py --max_steps 2000 \
    --num_rays 4096 --train_views 64 --eval_views 3

# inference-path throughput (forward-only render)
run bench_eval        python bench.py --mode eval
run bench_eval_2stage python bench.py --mode eval --visible_budget_ratio 0.5

# post-fused step anatomy trace
run bench_trace python bench.py --trace /tmp/r2_trace
run xplane python scripts/xplane.py /tmp/r2_trace

echo "=== extra drive complete $(date +%H:%M:%S)"
