#!/bin/bash
# Round-5 hardware campaign v4 — time-boxed tail of v3 after observing that
# EVERY learner-scale program pays a ~20-min cold tunnel compile on this
# recycled machine (the .jax_cache wipe; CLAUDE.md compile-time table).
# Changes vs v3: the GRU heaven-hell arm stops at 200 updates (its measured
# saturation point — the r5 pilot plateaued at 2.8e-3/step by 200), the tag
# GRU arm logs every 25 updates so a round-end kill still leaves rows, and
# the bench.py pre-warm moves behind the learning stages (the fused-taxi
# headline compiles fast; only the ant rows need the warm cache).
# Idempotent like v3: complete logs are skipped, learning resumes via --ckpt.
cd "$(dirname "$0")/.."
mkdir -p .r5_runs
R=.r5_runs

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
  if grep -q '"metric"\|CAMPAIGN_STAGE_OK' "$log" 2>/dev/null; then
    echo "[campaign] SKIP $log"; return 0
  fi
  for attempt in 1 2 3; do
    wait_tunnel || return 1
    echo "[campaign] start $log (attempt $attempt)"
    timeout "$to" "$@" > "$log" 2>&1 && { echo CAMPAIGN_STAGE_OK >> "$log"; return 0; }
    echo "[campaign] $log failed; retrying"
  done
}

# ---- 1. articulated heaven-hell FF arm (v3 stage 1; skipped if done) ----
learn $R/hh_ff.log $R/ck_hh_ff 2700 \
  --env AntHeavenHellPhysics-v0 --shaped --updates 300 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

# ---- 2. articulated heaven-hell GRU arm to its saturation point ----
learn $R/hh_gru.log $R/ck_hh_gru 4200 \
  --env AntHeavenHellPhysics-v0 --rnn --shaped --updates 200 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

# ---- 3. episode-level greedy eval of both checkpoints ----
stage $R/hh_eval_gru.log 1500 \
  python benchmarks/hh_eval.py --ckpt $R/ck_hh_gru --rnn --episodes 512
stage $R/hh_eval_ff.log 1500 \
  python benchmarks/hh_eval.py --ckpt $R/ck_hh_ff --episodes 512

# ---- 4. tag GRU recalibration: the lr 1e-3 arm (surrogate-calibrated) ----
learn $R/tag_gru_lr100.log $R/ck_tag_gru100 3600 \
  --env AntTagPhysics-v0 --rnn --updates 400 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 1e-3 --entropy-coef 0.001

# ---- 5. bench.py: validates the driver path + warms the wiped cache ----
stage $R/bench.log 3600 python bench.py

# ---- 6. hardware measures: chunked API + roofline ----
stage $R/cliff_api.log 3000 \
  python benchmarks/cliff_probe.py --api --batches 4096,16384 --steps 8
stage $R/roofline.log 3000 python benchmarks/roofline.py

# ---- 7. rk4 learning trend at reduced budget ----
learn $R/tag_rk4.log $R/ck_tag_rk4 5400 \
  --env AntTagPhysics-v0 --integrator rk4 --updates 150 --chunk 25 \
  --num-envs 2048 --rollout 32 --lr 2.5e-4 --entropy-coef 0.001

echo CAMPAIGN_DONE
