#!/bin/bash
# Self-healing round-2 measurement driver — the CANONICAL queue of every
# on-chip round-2 measurement (supersedes run_round2_measurements.sh /
# run_round2_extra.sh, which it absorbed). One success marker per step
# (.bench_logs/<name>.ok); steps that already succeeded are skipped,
# failed ones retried each pass; the loop exits when all of ITS OWN
# steps are done (CPU-sweep markers in the same dir don't count) or the
# deadline passes. Designed for a flaky TPU tunnel whose claim/init
# fails UNAVAILABLE after ~25 min when the server side is down — each
# attempt doubles as the recovery probe (single claimer, no
# kill-and-retry).
#
#   nohup bash scripts/run_round2_until_done.sh &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs bench_assets
DEADLINE=$(( $(date +%s) + ${ROUND2_BUDGET_S:-36000} ))

STEPS=()  # every `run` registers its name here (completion check)

run() {
  local name=$1; shift
  STEPS+=("$name")
  [ -f ".bench_logs/$name.ok" ] && return 0
  [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
  echo "=== $name start $(date +%H:%M:%S)"
  timeout 7200 "$@" > ".bench_logs/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && ! grep -q "Unable to initialize backend" ".bench_logs/$name.log"; then
    touch ".bench_logs/$name.ok"
  fi
  echo "=== $name exit=$rc $(date +%H:%M:%S)"
  tail -2 ".bench_logs/$name.log" | sed 's/^/    /'
}

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
DN=(examples/train_mlp_dnerf.py --max_steps 2000 --num_rays 2048
    --image_size 96 --grid_resolution 96 --samples_budget 65536
    --test_chunk_size 2048 --eval_views 2)

probe() {
  # Fast liveness gate: scripts/tpu_probe.py completes in seconds when
  # the tunnel is up; when the server side is down it hangs in the
  # session wait (claim_timeout_s does NOT bound that phase — measured),
  # so an outer timeout kills it. Safe: a client that never got a grant
  # holds nothing server-side.
  env -u PALLAS_AXON_POOL_IPS timeout 300 \
    python scripts/tpu_probe.py 240 > .bench_logs/probe.log 2>&1
}

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

  # throughput: fused before/after, two-stage, int8
  run bench_fused       python bench.py
  run bench_nofuse      python bench.py --no_fused_march
  run bench_2stage      python bench.py --visible_budget_ratio 0.5
  run bench_2stage_lo   python bench.py --visible_budget_ratio 0.33
  run bench_int8        python bench.py --quant_int8
  run bench_int8_2stage python bench.py --quant_int8 --visible_budget_ratio 0.5

  # trained-grid realism
  run save_grid     python scripts/save_bench_grid.py --steps 2000
  [ -f bench_assets/trained_grid.npz ] && \
    run bench_trained python bench.py --grid trained

  # hash-grid NGP numbers
  run bench_ngp     python bench.py --model ngp
  run bench_ngp_xla python bench.py --model ngp --ngp_xla_grad

  # inference throughput
  run bench_eval        python bench.py --mode eval
  run bench_eval_2stage python bench.py --mode eval --visible_budget_ratio 0.5

  # quality: cone-angle + int8 gates (vs q_base1k). q_base360 pins
  # --cone_angle 0 explicitly: in unbounded mode the CLI default is the
  # reference's 0.004, so omitting the flag would A/B nothing.
  run q_base1k  python "${TQ[@]}"
  run q_cone1k  python "${TQ[@]}" --cone_angle 0.004
  run q_int8_1k python "${TQ[@]}" --quant_int8
  run q_cone360 python "${U360[@]}" --cone_angle 0.004
  run q_base360 python "${U360[@]}" --cone_angle 0

  # D-NeRF sweep (CPU mini-sweep ranks these; chip runs are the record)
  run dn_base   python "${DN[@]}"
  run dn_v64    python "${DN[@]}" --train_views 64
  run dn_cap    python "${DN[@]}" --train_views 64 --warp_depth 6 \
                --warp_width 128 --time_degree 8
  run dn_lr     python "${DN[@]}" --train_views 64 --lr 1e-3
  run dn_lr_cap python "${DN[@]}" --train_views 64 --warp_depth 6 \
                --warp_width 128 --time_degree 8 --lr 1e-3
  run dn_tdeg2  python "${DN[@]}" --train_views 64 --time_degree 2
  run dn_5k     python "${DN[@]}" --max_steps 5000 --train_views 64

  # proposal-pipeline throughput (train_samples_per_s, compile excluded)
  run prop_2k python examples/train_proposal_nerf.py --max_steps 2000 \
      --num_rays 4096 --image_size 96 --eval_views 2 --test_chunk_size 2048

  # post-fused step anatomy
  run bench_trace python bench.py --trace /tmp/r2_trace
  [ -d /tmp/r2_trace ] && run xplane python scripts/xplane.py /tmp/r2_trace

  n_ok=0
  for s in "${STEPS[@]}"; do
    [ -f ".bench_logs/$s.ok" ] && n_ok=$((n_ok + 1))
  done
  echo "=== pass $pass done: $n_ok/${#STEPS[@]} steps ok"
  [ "$n_ok" -ge "${#STEPS[@]}" ] && break
  sleep 60
done
echo "=== until-done driver exit $(date +%H:%M:%S)"
