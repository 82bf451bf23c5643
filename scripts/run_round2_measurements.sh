#!/bin/bash
# Round-2 on-chip measurement drive: every number ROADMAP lists as
# "pending chip time", run sequentially by ONE claimer process chain.
#
# Background: the axon tunnel hands out an exclusive chip claim; killed
# clients can wedge the claim server-side for hours. This script is
# designed to be the single long-window claimer — if the claim is wedged
# when it starts, the first step waits (near-zero CPU) and the drive
# auto-completes when the claim recovers. Per-step timeouts are generous
# (kill-and-retry on short timeouts is what re-wedges the claim).
#
#   nohup bash scripts/run_round2_measurements.sh &
#
# Logs: .bench_logs/<name>.log ; summary line per step on stdout.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs bench_assets

run() {
  local name=$1; shift
  echo "=== $name start $(date +%H:%M:%S)"
  timeout 7200 "$@" > ".bench_logs/$name.log" 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)"
  tail -2 ".bench_logs/$name.log" | sed 's/^/    /'
}

# --- throughput bench: fused-march before/after (VERDICT #3) ---
run bench_fused   python bench.py
run bench_nofuse  python bench.py --no_fused_march

# --- trained-grid realism (VERDICT #10) ---
run save_grid     python scripts/save_bench_grid.py --steps 2000
run bench_trained python bench.py --grid trained

# --- hash-grid NGP numbers (VERDICT #2) ---
run bench_ngp     python bench.py --model ngp
run bench_ngp_xla python bench.py --model ngp --ngp_xla_grad

# --- cone-angle quality (VERDICT #5): cone=0.004 vs cone=0 baseline ---
TQ=(examples/train_ngp_nerf.py --model tensorf --num_rays 8192
    --image_size 128 --grid_resolution 128 --samples_budget 393216
    --visible_samples_budget 196608 --test_chunk_size 4096 --eval_views 3
    --coarse_stride 16 --probe_groups 32 --max_steps 1000)
run q_base1k  python "${TQ[@]}"
run q_cone1k  python "${TQ[@]}" --cone_angle 0.004
run q_cone360 python examples/train_ngp_nerf.py --model tensorf \
    --scene procedural360 --unbounded --max_steps 2000 --num_rays 4096 \
    --image_size 96 --grid_resolution 128 --samples_budget 262144 \
    --visible_samples_budget 131072 --test_chunk_size 2048 --eval_views 3 \
    --train_views 64 --coarse_stride 16 --probe_groups 32 \
    --fixed_occ_thre 1 --occ_cone_coupling 1 --cone_angle 0.004
run q_base360 python examples/train_ngp_nerf.py --model tensorf \
    --scene procedural360 --unbounded --max_steps 2000 --num_rays 4096 \
    --image_size 96 --grid_resolution 128 --samples_budget 262144 \
    --visible_samples_budget 131072 --test_chunk_size 2048 --eval_views 3 \
    --train_views 64 --coarse_stride 16 --probe_groups 32 \
    --fixed_occ_thre 1 --occ_cone_coupling 1

# --- D-NeRF quality sweep (VERDICT #6, target >= 32 PSNR) ---
DN=(examples/train_mlp_dnerf.py --max_steps 2000 --num_rays 2048
    --image_size 96 --grid_resolution 96 --samples_budget 65536
    --test_chunk_size 2048 --eval_views 2)
run dn_base   python "${DN[@]}"
run dn_v64    python "${DN[@]}" --train_views 64
run dn_cap    python "${DN[@]}" --train_views 64 --warp_depth 6 \
              --warp_width 128 --time_degree 8
run dn_lr     python "${DN[@]}" --train_views 64 --lr 1e-3
run dn_lr_cap python "${DN[@]}" --train_views 64 --warp_depth 6 \
              --warp_width 128 --time_degree 8 --lr 1e-3

# long-budget run at the sweep's base+views config (the record candidate;
# reference D-NeRF trains 30k steps — 2k is the sweep budget, not the recipe)
run dn_5k     python "${DN[@]}" --max_steps 5000 --train_views 64

echo "=== drive complete $(date +%H:%M:%S)"
