#!/bin/bash
# Round-5 hardware campaign v2 — equal-budget heaven-hell arms (the GRU
# pilot saturated by update 200, so 300 updates is the comparison budget).
# Idempotent: stages whose log already holds the final '"metric"' line are
# skipped; learning stages resume from --ckpt after tunnel crashes.
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jax.jit(lambda a:(a*2).sum())(jnp.ones(8))))" >/dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 240); do
    probe && return 0
    echo "[campaign] probe $i: tunnel down, sleeping 60s"
    sleep 60
  done
  return 1
}

learn() {
  log=$1; ck=$2; to=$3; shift 3
  if grep -q '"metric"' "$log" 2>/dev/null; then
    echo "[campaign] SKIP $log (already complete)"; return 0
  fi
  for attempt in $(seq 1 12); do
    wait_tunnel || return 1
    echo "[campaign] start $log (attempt $attempt)"
    timeout "$to" python benchmarks/ant_learning.py "$@" --ckpt "$ck" >> "$log" 2>&1
    grep -q '"metric"' "$log" && { echo "[campaign] done $log"; return 0; }
    echo "[campaign] $log incomplete; retrying"
  done
}

stage() {
  log=$1; to=$2; shift 2
  if [ -s "$log" ] && ! grep -qi "error\|Traceback" "$log"; then
    echo "[campaign] SKIP $log"; return 0
  fi
  for attempt in 1 2 3; do
    wait_tunnel || return 1
    echo "[campaign] start $log (attempt $attempt)"
    timeout "$to" "$@" > "$log" 2>&1 && return 0
    echo "[campaign] $log failed; retrying"
  done
}

# ---- 1. articulated heaven-hell, equal budget 300 updates (19.6M steps) ----
learn /tmp/r5_anthh_gru_pilot.log /tmp/ck_hh_gru_p 3600 \
  --env AntHeavenHellPhysics-v0 --rnn --shaped --updates 300 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

learn /tmp/r5_anthh_ff_main.log /tmp/ck_hh_ff_m 3600 \
  --env AntHeavenHellPhysics-v0 --shaped --updates 300 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

# ---- 2. pointmass shaped FF (feedforward's best shot, gamma=1 PBRS) ----
learn /tmp/r5_hh_ffsh.log /tmp/ck_hh_ffsh 2400 \
  --env HeavenHellContinuous-v0 --shaped --updates 300 --chunk 50 \
  --num-envs 4096 --rollout 64 --lr 1e-3 --entropy-coef 0.003

# ---- 3. tag GRU recalibration: lr sweep on the articulated env ----
learn /tmp/r5_anttag_gru_lr50.log /tmp/ck_tag_gru50 4800 \
  --env AntTagPhysics-v0 --rnn --updates 600 --chunk 50 \
  --num-envs 2048 --rollout 32 --lr 5e-4 --entropy-coef 0.001

learn /tmp/r5_anttag_gru_lr100.log /tmp/ck_tag_gru100 4800 \
  --env AntTagPhysics-v0 --rnn --updates 600 --chunk 50 \
  --num-envs 2048 --rollout 32 --lr 1e-3 --entropy-coef 0.001

# ---- 4. rk4 learning (the exact reference physics config) ----
learn /tmp/r5_anttag_rk4.log /tmp/ck_tag_rk4 10800 \
  --env AntTagPhysics-v0 --integrator rk4 --updates 450 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

# ---- 5. hardware measures: chunked API + roofline ----
stage /tmp/r5_cliff_api.log 4000 \
  python benchmarks/cliff_probe.py --api --batches 4096,16384 --steps 8
stage /tmp/r5_roofline.log 4000 python benchmarks/roofline.py

echo CAMPAIGN_DONE
