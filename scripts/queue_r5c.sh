#!/bin/bash
# Round-5 final-hour queue (after the pick_probe2 steady-state fps probe).
# Waits for the in-flight probe (pid file or metrics quiescence), then:
#  - factory_pick_r5 (only if probe steady fps >= 5000 — else the fori fix
#    did not restore Pick throughput and a long run is wasted TPU time)
#  - a1terrain_r5   (VERDICT item 4: retrain after spawn depenetration)
#  - amp_walk_r5    (VERDICT item 6: continue past epoch 425 from r4 best)
#  - profile_epoch  (VERDICT item 9: committed learner-bound artifact)
set -u
cd /root/repo

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  sleep 8
fi

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== r5c: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  mkdir -p "runs/$name"
  GRACE=${GRACE:-600} timeout $((total + 700)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "runs/$name/stdout.log" 2>&1
  echo "=== r5c: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

# steady-state fps = max fps over epochs >= 1 (epoch 0 includes compile)
PICK_FPS=$(python3 - <<'EOF'
import json
try:
    ls = [json.loads(l) for l in open('runs/pick_probe2/metrics.jsonl')]
    print(int(max((m['performance/step_fps'] for m in ls if m['step'] >= 1), default=0)))
except Exception:
    print(0)
EOF
)
echo "=== r5c: pick probe steady fps = $PICK_FPS ===" >&2

if [ "$PICK_FPS" -ge 5000 ]; then
  rm -rf runs/factory_pick_r5
  run factory_pick_r5 900 python train.py task=FactoryTaskNutBoltPick \
    experiment=factory_pick_r5 seed=42 num_envs=256 \
    train.params.config.minibatch_size=1024
fi

rm -rf runs/a1terrain_r5
run a1terrain_r5 600 python train.py task=A1Terrain \
  experiment=a1terrain_r5 seed=42

rm -rf runs/amp_walk_r5
run amp_walk_r5 500 python train.py task=HumanoidAMP \
  experiment=amp_walk_r5 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=6000 \
  task.sim.contact_timeconst=0.0 task.sim.friction_timeconst=0.0 \
  checkpoint=runs/amp_walk_hard_r4/nn/best.ckpt

timeout 600 python scripts/profile_epoch.py > runs/profile_epoch_r5.log 2>&1

echo "=== r5c queue complete $(date +%H:%M:%S) ===" >&2
