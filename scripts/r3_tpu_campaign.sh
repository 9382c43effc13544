#!/bin/bash
# Round-3 TPU validation campaign (VERDICT r2 items 2/3/4 + final bench).
# Sequential on purpose: 1-core host + single tunnel chip (CLAUDE.md).
# Each stage is resumable — rerun the script and finished stages are skipped
# via their sentinel logs in $LOGDIR.
set -u
cd /root/repo
LOGDIR=${LOGDIR:-/tmp/r3_campaign}
mkdir -p "$LOGDIR"
stamp() { date "+%H:%M:%S"; }

run_stage() {  # run_stage <name> <timeout_sec> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$LOGDIR/$name.ok" ]; then echo "[$(stamp)] $name: already done"; return 0; fi
  echo "[$(stamp)] $name: starting"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    touch "$LOGDIR/$name.ok"; echo "[$(stamp)] $name: OK"
  else
    local rc=$?  # capture before $(stamp) resets $?
    echo "[$(stamp)] $name: FAILED (rc=$rc) — see $LOGDIR/$name.log"
  fi
}

# -1. never contend with a running test suite (1-core host, CLAUDE.md)
while [ -f /tmp/pytest.pid ] && kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do
  echo "[$(stamp)] waiting for pytest ($(cat /tmp/pytest.pid)) to finish"; sleep 60
done

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" || { echo "tunnel down"; exit 1; }

# 1. VERDICT item 4: the two never-TPU-validated models, one attack each
#    (reference --model surface, utils/models.py:180-257).
run_stage jb_lstmatt 2400 python -m audiobd_tpu jingleback --synthetic --style 1 \
  --model lstmwithattention --result jingleback_lstmatt_r3
run_stage ultra_rnn 2400 python -m audiobd_tpu ultrasonic --synthetic \
  --model rnn --result ultrasonic_rnn_r3

# 2. VERDICT item 2 completion: TSBD full-path wall with the vectorized
#    stage D, cold then warm compile cache (target < 5 min warm).
run_stage tsbd_attack 1800 python -m audiobd_tpu badnets --synthetic --result badnets_tsbd_r3
run_stage tsbd_cold 3600 python -m audiobd_tpu tsbd --result badnets_tsbd_r3 --only_finetune false
run_stage tsbd_warm 3600 python -m audiobd_tpu tsbd --result badnets_tsbd_r3 --only_finetune false
run_stage fp_warm 1200 python -m audiobd_tpu fp --result badnets_tsbd_r3

# 3. bench (BENCH_r03 preview)
run_stage bench 3600 python bench.py

# 4. VERDICT item 5: per-op epoch attribution (extend Pallas backward to
#    blocks 2-3, or record the measured bound)
run_stage profile_bf16 1800 python scripts/profile_smallcnn.py bfloat16
run_stage profile_bf16_unfused 1800 env PROF_FUSED=off python scripts/profile_smallcnn.py bfloat16

# 5. VERDICT item 3: FlowMur fused-vs-unfused seed study (longest; resumable
#    via /tmp/flowmur_seed_study.jsonl)
run_stage flowmur_study 21600 python scripts/flowmur_seed_study.py

echo "[$(stamp)] campaign complete"
