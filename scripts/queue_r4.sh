#!/bin/bash
# Round-4 TPU queue — VERDICT.md priorities in order:
#   1. hands-tier training-to-success (plain ShadowHand, then OpenAI FF+DR)
#   2. Factory Pick with the fixed metric
#   3. Trifinger real run
#   4. AMP wall-break attempt (LowGP)
#   5. A1Terrain post-fix validation run
#   6. Ant solver A/Bs
# Long runs go through run_resumable: if the process dies or wedges
# mid-run (tunnel claim race), it relaunches from nn/last.ckpt until the
# wall budget is spent — the round-3 queue lost its ShadowHand run to a
# single wedge.
set -u
cd /root/repo

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== queue: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  GRACE=${GRACE:-600} timeout $((total + 900)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "/tmp/queue_${name}.log" 2>&1
  echo "=== queue: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

run_resumable() {
  local name="$1"; local total="$2"; shift 2
  local start=$(date +%s)
  local first=1
  while :; do
    local now=$(date +%s); local left=$((total - (now - start)))
    # don't bother relaunching for < 15 min (compile alone eats ~5)
    [ "$left" -lt 900 ] && break
    local ck=""
    if [ "$first" = 0 ] && [ -f "runs/$name/nn/last.ckpt" ]; then
      ck="checkpoint=runs/$name/nn/last.ckpt"
    fi
    echo "=== queue: $name segment (left ${left}s) $(date +%H:%M:%S) ===" >&2
    GRACE=600 timeout $((left + 900)) scripts/tpu_run.sh \
      "runs/$name/metrics.jsonl" "$left" "$@" $ck \
      >> "/tmp/queue_${name}.log" 2>&1
    first=0
    # finished naturally (metrics stopped because train completed)?
    grep -q "train done" "/tmp/queue_${name}.log" 2>/dev/null && break
  done
  echo "=== queue: $name done $(date +%H:%M:%S) ===" >&2
}

fresh() { rm -rf "runs/$1"; }

# 1a. plain ShadowHand (no DR, full_state): the fastest route to
#     double-digit consecutive successes
fresh shadowhand_r4
run_resumable shadowhand_r4 4500 python train.py task=ShadowHand \
  experiment=shadowhand_r4 seed=42

# 1b. OpenAI FF + full DR — the reference headline config
fresh shadowhand_ff_r4
run_resumable shadowhand_ff_r4 5400 python train.py task=ShadowHandOpenAI_FF \
  experiment=shadowhand_ff_r4 seed=42

# 2. Factory NutBoltPick at reference scale with the fixed success metric
fresh factory_pick_r4
run factory_pick_r4 2400 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r4 seed=42

# 3. Trifinger with asymmetric critic (first real run)
fresh trifinger_r4
run trifinger_r4 2400 python train.py task=Trifinger \
  experiment=trifinger_r4 seed=42 num_envs=8192

# 4. AMP walk with LowGP (disc saturated at GP=5; see VERDICT #4)
fresh amp_walk_lowgp_r4
run amp_walk_lowgp_r4 2100 python train.py task=HumanoidAMP \
  train=HumanoidAMPPPOLowGP experiment=amp_walk_lowgp_r4 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=3000

# 5. A1Terrain after the spawn-clamp + depenetration-cap fix
fresh a1terrain_r4
run a1terrain_r4 1500 python train.py task=A1Terrain \
  experiment=a1terrain_r4 seed=42

# 6. Ant solver A/Bs (8-iter warm-start vs 12-iter cold; seed control)
fresh ant_si12_s42
run ant_si12_s42 700 python train.py task=Ant experiment=ant_si12_s42 \
  seed=42 max_iterations=1500 task.sim.num_solver_iterations=12 \
  task.sim.warmstart_solver=false
fresh ant_r4_s7
run ant_r4_s7 700 python train.py task=Ant experiment=ant_r4_s7 seed=7 \
  max_iterations=1500

echo "=== r4 queue complete $(date +%H:%M:%S) ===" >&2
