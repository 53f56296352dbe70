#!/bin/bash
# Round-5 follow-on queue: waits for the in-flight shadowhand_ff_r5
# tpu_run (pid passed as $1) to exit, then runs:
#  - factory_pick_r5 with the fori_loop close_and_lift fix (the lax.cond
#    tail executed both branches on TPU -> 600 fps and worker crashes at
#    >=256 envs; Screw proved the same scene does 38K fps)
#  - a1terrain_r5 after the spawn-depenetration fix
#  - amp_walk_r5 continuation from the r4 best ckpt
#  - franka_cabinet_r5 / franka_cube_r5 first real curves
set -u
cd /root/repo

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  sleep 10
fi

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== r5b: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  mkdir -p "runs/$name"
  GRACE=${GRACE:-1200} timeout $((total + 600)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "runs/$name/stdout.log" 2>&1
  echo "=== r5b: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

rm -rf runs/factory_pick_r5
run factory_pick_r5 3000 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r5 seed=42 num_envs=256 \
  train.params.config.minibatch_size=1024

rm -rf runs/a1terrain_r5
run a1terrain_r5 1200 python train.py task=A1Terrain \
  experiment=a1terrain_r5 seed=42

rm -rf runs/amp_walk_r5
run amp_walk_r5 1200 python train.py task=HumanoidAMP \
  experiment=amp_walk_r5 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=6000 \
  task.sim.contact_timeconst=0.0 task.sim.friction_timeconst=0.0 \
  checkpoint=runs/amp_walk_hard_r4/nn/best.ckpt

rm -rf runs/franka_cabinet_r5
run franka_cabinet_r5 1200 python train.py task=FrankaCabinet \
  experiment=franka_cabinet_r5 seed=42

rm -rf runs/franka_cube_r5
run franka_cube_r5 900 python train.py task=FrankaCubeStack \
  experiment=franka_cube_r5 seed=42

echo "=== r5b queue complete $(date +%H:%M:%S) ===" >&2
