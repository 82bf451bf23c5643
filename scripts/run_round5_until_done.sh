#!/bin/bash
# Round-5 on-chip measurement driver. Unlike rounds 3/4 (fixed job list
# baked into the script) this one drains a QUEUE FILE so new jobs can be
# appended while the driver runs:
#
#   .bench_logs/queue5.txt   lines of:  name<TAB>command...
#
# Marker rules are inherited from round 4: .ok markers carry content and
# are only written after a zero exit + backend sanity grep; an empty .ok
# is invalid; deliberate skips get a reasoned .skip marker. Jobs run in
# queue order; already-ok jobs are skipped, so re-passes only run new or
# previously-failed entries. The tunnel probe gates each pass.
#
#   nohup bash scripts/run_round5_until_done.sh > .bench_logs/driver5.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p .bench_logs bench_assets
QUEUE=.bench_logs/queue5.txt
touch "$QUEUE"
DEADLINE=$(( $(date +%s) + ${ROUND5_BUDGET_S:-40000} ))

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

run_one() {
  local name=$1; shift
  ok_marker_valid "$name" && return 0
  [ -f ".bench_logs/$name.skip" ] && return 0
  [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
  echo "=== $name start $(date +%H:%M:%S)"
  timeout "${STEP_TIMEOUT_S:-10800}" bash -c "$*" > ".bench_logs/$name.log" 2>&1 &
  local job=$!
  # init-liveness watchdog: a client whose tunnel session wedges blocks
  # FOREVER in backend init (futex wait, ~zero CPU, no log output past
  # the backend warning) — kill it after INIT_GRACE_S of no real output
  # so the pass can finish and the probe gate can re-check the tunnel
  local waited=0 grace="${INIT_GRACE_S:-600}"
  while kill -0 "$job" 2>/dev/null; do
    sleep 15
    waited=$((waited + 15))
    if [ "$waited" -ge "$grace" ]; then
      if ! grep -qv "xla_bridge\|^WARNING\|^$" ".bench_logs/$name.log"; then
        echo "!!! $name: no output after ${waited}s (wedged init) — killing"
        kill -- -"$job" 2>/dev/null || kill "$job" 2>/dev/null
        pkill -P "$job" 2>/dev/null
      fi
      grace=$((grace + 600))  # re-check later only if output appeared
    fi
  done
  wait "$job"
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

pass=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! probe; then
    echo "=== tunnel down $(date +%H:%M:%S); re-probing in 120s"
    sleep 120
    continue
  fi
  pass=$((pass + 1))
  echo "=== pass $pass $(date +%H:%M:%S) (tunnel up, $(wc -l < "$QUEUE") queued)"
  n_total=0; n_ok=0; n_skip=0
  # snapshot the queue for this pass (appends land in the next pass)
  mapfile -t LINES < "$QUEUE"
  for line in "${LINES[@]}"; do
    [ -z "$line" ] && continue
    case "$line" in \#*) continue ;; esac
    name=${line%%$'\t'*}
    cmd=${line#*$'\t'}
    n_total=$((n_total + 1))
    run_one "$name" "$cmd"
    ok_marker_valid "$name" && n_ok=$((n_ok + 1))
    [ -f ".bench_logs/$name.skip" ] && n_skip=$((n_skip + 1))
    [ "$(date +%s)" -ge "$DEADLINE" ] && break
  done
  echo "=== pass $pass done: $n_ok ok, $n_skip SKIPPED, $(( n_total - n_ok - n_skip )) pending of $n_total"
  if [ $((n_ok + n_skip)) -ge "$n_total" ]; then
    # fully drained — idle-wait for appends rather than exiting, so the
    # builder can keep feeding jobs without restarting the driver
    if [ "${EXIT_WHEN_DRAINED:-0}" = "1" ]; then break; fi
    sleep 60
  else
    sleep 20
  fi
done
echo "=== round-5 driver exit $(date +%H:%M:%S)"
