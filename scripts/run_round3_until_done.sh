#!/bin/bash
# Round-3 on-chip measurement driver. Same self-healing pass structure as
# round 2, with the round-2 VERDICT's marker fix: SUCCESS markers
# (.bench_logs/<name>.ok) are only written by this script after a zero
# exit + backend sanity grep, and always CARRY CONTENT (rc, timestamp,
# last log line). An EMPTY .ok is treated as absent (and renamed to
# .ok.empty-invalid) — hand-touched markers can no longer fake success.
# Steps that are deliberately not run get an explicit .skip marker whose
# CONTENT is the reason; the pass summary reports ok/skip/pending
# separately.
#
#   nohup bash scripts/run_round3_until_done.sh > .bench_logs/driver3.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs bench_assets
DEADLINE=$(( $(date +%s) + ${ROUND3_BUDGET_S:-36000} ))

STEPS=()

ok_marker_valid() {
  # empty success markers are invalid (round-2 lesson)
  local f=".bench_logs/$1.ok"
  [ -f "$f" ] || return 1
  if [ ! -s "$f" ]; then
    mv "$f" "$f.empty-invalid"
    echo "!!! $1: empty .ok marker invalidated (round-2 rule)"
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

skip() {
  # explicit, reasoned skip — reported as SKIPPED, never as ok
  local name=$1; shift
  STEPS+=("$name")
  [ -f ".bench_logs/$name.skip" ] && return 0
  echo "skipped $(date -Is): $*" > ".bench_logs/$name.skip"
  echo "=== $name SKIPPED: $*"
}

probe() {
  env -u PALLAS_AXON_POOL_IPS timeout 300 \
    python scripts/tpu_probe.py 240 > .bench_logs/probe.log 2>&1
}

# flagship 1k-step quality gate (the round-2 config)
TQ=(examples/train_ngp_nerf.py --model tensorf --num_rays 8192
    --image_size 128 --grid_resolution 128 --samples_budget 393216
    --visible_samples_budget 196608 --test_chunk_size 4096 --eval_views 3
    --coarse_stride 16 --probe_groups 32 --max_steps 1000)
U360=(examples/train_ngp_nerf.py --model tensorf
    --scene procedural360 --unbounded --max_steps 2000 --num_rays 4096
    --image_size 96 --grid_resolution 128 --samples_budget 262144
    --visible_samples_budget 131072 --test_chunk_size 2048 --eval_views 3
    --train_views 64 --coarse_stride 16 --probe_groups 32
    --fixed_occ_thre 1 --occ_cone_coupling 1)
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

  # --- throughput: flagship regression check + hash path ---
  run bench_flagship python bench.py
  run bench_ngp      python bench.py --model ngp
  run save_grid      python scripts/save_bench_grid.py --steps 2000
  [ -f bench_assets/trained_grid.npz ] && \
    run bench_ngp_trained python bench.py --model ngp --grid trained

  # --- VERDICT #3 debts: cone-angle A/B, both scenes ---
  run q_base1k  python "${TQ[@]}"
  run q_cone1k  python "${TQ[@]}" --cone_angle 0.004
  run q_cone360 python "${U360[@]}" --cone_angle 0.004
  run q_base360 python "${U360[@]}" --cone_angle 0

  # --- VERDICT #4: gate drift — n=3 seeds x {XLA, fused} selection ---
  run q_gate_s43 python "${TQ[@]}" --seed 43
  run q_gate_s44 python "${TQ[@]}" --seed 44
  run q_gate_fused_s42 python "${TQ[@]}" --fused_march
  run q_gate_fused_s43 python "${TQ[@]}" --fused_march --seed 43
  run q_gate_fused_s44 python "${TQ[@]}" --fused_march --seed 44

  # --- VERDICT #3: D-NeRF quality sweep (target: close on 32) ---
  run dn_2k     python "${DN[@]}" --max_steps 2000
  run dn_5k     python "${DN[@]}" --max_steps 5000
  run dn_5k_cap python "${DN[@]}" --max_steps 5000 --warp_depth 6 \
                --warp_width 128 --time_degree 8
  run dn_10k    python "${DN[@]}" --max_steps 10000 --warp_depth 6 \
                --warp_width 128 --time_degree 8

  # --- eval-mode inference regression number ---
  run bench_eval     python bench.py --mode eval

  # --- VERDICT #7: boundary-scoped re-check A/B (march-only) ---
  run recheck_ab python scripts/bench_recheck_ab.py

  # --- VERDICT #1: hash-NGP composition bisect (where do the seconds go) ---
  run bisect_ngp python scripts/bisect_ngp4.py

  # --- VERDICT #8: real-data readiness drill (on-chip, real loader) ---
  run realdata_drill python scripts/run_realdata_drill.py --max_steps 1000

  # --- hash-NGP quality gate ---
  run q_ngp1k python "${NGPQ[@]}"

  # --- step anatomy after the hash fixes ---
  run bench_ngp_trace python bench.py --model ngp --iters 3 --trace /tmp/r3_trace
  [ -d /tmp/r3_trace ] && run xplane_ngp python scripts/xplane.py /tmp/r3_trace

  n_ok=0; n_skip=0
  for s in "${STEPS[@]}"; do
    ok_marker_valid "$s" && n_ok=$((n_ok + 1))
    [ -f ".bench_logs/$s.skip" ] && n_skip=$((n_skip + 1))
  done
  echo "=== pass $pass done: $n_ok ok, $n_skip SKIPPED, $(( ${#STEPS[@]} - n_ok - n_skip )) pending of ${#STEPS[@]}"
  [ $((n_ok + n_skip)) -ge "${#STEPS[@]}" ] && break
  sleep 60
done
echo "=== round-3 driver exit $(date +%H:%M:%S)"
