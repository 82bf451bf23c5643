#!/bin/bash
# Round-4 on-chip measurement driver. Same self-healing pass structure
# and marker rules as round 3 (.ok markers carry content and are only
# written after a zero exit + backend sanity grep; empty .ok = invalid;
# deliberate skips get a reasoned .skip marker).
#
#   nohup bash scripts/run_round4_until_done.sh > .bench_logs/driver4.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs bench_assets
DEADLINE=$(( $(date +%s) + ${ROUND4_BUDGET_S:-36000} ))

STEPS=()

ok_marker_valid() {
  local f=".bench_logs/$1.ok"
  [ -f "$f" ] || return 1
  if [ ! -s "$f" ]; then
    mv "$f" "$f.empty-invalid"
    echo "!!! $1: empty .ok marker invalidated"
    return 1
  fi
  return 0
}

run() {
  local name=$1; shift
  STEPS+=("$name")
  ok_marker_valid "$name" && return 0
  [ -f ".bench_logs/$name.skip" ] && return 0
  [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
  echo "=== $name start $(date +%H:%M:%S)"
  timeout "${STEP_TIMEOUT_S:-7200}" "$@" > ".bench_logs/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && ! grep -q "Unable to initialize backend" ".bench_logs/$name.log"; then
    {
      echo "ok rc=0 $(date -Is)"
      echo "cmd: $*"
      tail -1 ".bench_logs/$name.log"
    } > ".bench_logs/$name.ok"
  fi
  echo "=== $name exit=$rc $(date +%H:%M:%S)"
  tail -2 ".bench_logs/$name.log" | sed 's/^/    /'
}

probe() {
  env -u PALLAS_AXON_POOL_IPS timeout 300 \
    python scripts/tpu_probe.py 240 > .bench_logs/probe.log 2>&1
}

# flagship 1k-step quality gate (the round-2/3 config)
TQ=(examples/train_ngp_nerf.py --model tensorf --num_rays 8192
    --image_size 128 --grid_resolution 128 --samples_budget 393216
    --visible_samples_budget 196608 --test_chunk_size 4096 --eval_views 3
    --coarse_stride 16 --probe_groups 32 --max_steps 1000)
# unbounded 360, round-4 recipe: auto-sized lattice + adaptive thre +
# s-space distortion (see docs/benchmarks.md round-4 360 section)
U360=(examples/train_ngp_nerf.py --model tensorf
    --scene procedural360 --unbounded --max_steps 2000 --num_rays 4096
    --image_size 96 --grid_resolution 256 --samples_budget 524288
    --visible_samples_budget 262144 --test_chunk_size 2048 --eval_views 3
    --train_views 64 --coarse_stride 16 --probe_groups 32
    --fixed_occ_thre 0 --occ_cone_coupling 0 --distortion_loss 0.03)
DN=(examples/train_mlp_dnerf.py --num_rays 2048
    --image_size 96 --grid_resolution 96 --samples_budget 65536
    --test_chunk_size 2048 --eval_views 2 --train_views 64)
NGPQ=(examples/train_ngp_nerf.py --model ngp --num_rays 8192
    --image_size 128 --grid_resolution 128 --samples_budget 393216
    --visible_samples_budget 98304 --test_chunk_size 4096 --eval_views 3
    --coarse_stride 16 --probe_groups 32 --max_steps 1000)

pass=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! probe; then
    echo "=== tunnel down $(date +%H:%M:%S); re-probing in 120s"
    sleep 120
    continue
  fi
  pass=$((pass + 1))
  echo "=== pass $pass $(date +%H:%M:%S) (tunnel up)"
  STEPS=()

  # --- throughput regression checks + hash path w/ compaction ---
  run r4_bench_flagship python bench.py
  run r4_bench_ngp      python bench.py --model ngp
  [ -f bench_assets/trained_grid.npz ] && \
    run r4_bench_ngp_trained python bench.py --model ngp --grid trained
  run r4_bench_eval     python bench.py --mode eval

  # --- VERDICT #5: fused-march gate A/B, 3 seeds (flag exists now) ---
  run r4_gate_fused_s42 python "${TQ[@]}" --fused_march
  run r4_gate_fused_s43 python "${TQ[@]}" --fused_march --seed 43
  run r4_gate_fused_s44 python "${TQ[@]}" --fused_march --seed 44

  # --- 360 recipe at longer training (the round-4 fix validated) ---
  run r4_360_5k     python "${U360[@]}" --max_steps 5000
  run r4_360_5k_s43 python "${U360[@]}" --max_steps 5000 --seed 43

  # --- hash quality gates with compaction on (1k always; 2k restores
  # the advisor-flagged deeper gate when the pass has time left) ---
  run r4_q_ngp1k python "${NGPQ[@]}"
  run r4_q_ngp2k python "${NGPQ[@]}" --max_steps 2000

  n_ok=0; n_skip=0
  for s in "${STEPS[@]}"; do
    ok_marker_valid "$s" && n_ok=$((n_ok + 1))
    [ -f ".bench_logs/$s.skip" ] && n_skip=$((n_skip + 1))
  done
  echo "=== pass $pass done: $n_ok ok, $n_skip SKIPPED, $(( ${#STEPS[@]} - n_ok - n_skip )) pending of ${#STEPS[@]}"
  [ $((n_ok + n_skip)) -ge "${#STEPS[@]}" ] && break
  sleep 60
done
echo "=== round-4 driver exit $(date +%H:%M:%S)"
