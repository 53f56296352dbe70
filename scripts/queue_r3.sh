#!/bin/bash
# Round-3 serial TPU training queue: one job at a time (the tunneled chip
# is single-claim), each under the tpu_run.sh watchdog with a per-job
# wall-clock budget. Produces the VERDICT round-3 training evidence.
set -u
cd /root/repo

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== queue: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  rm -rf "runs/$name"
  GRACE=600 timeout $((total + 800)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "/tmp/queue_${name}.log" 2>&1
  echo "=== queue: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

run shadowhand_ff_r3 2100 python train.py task=ShadowHandOpenAI_FF \
  experiment=shadowhand_ff_r3 seed=42
run ant_r3 420 python train.py task=Ant experiment=ant_r3 seed=42 \
  max_iterations=1500
run amp_walk_r3 800 python train.py task=HumanoidAMP \
  experiment=amp_walk_r3 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=4000
run amp_run_r3 800 python train.py task=HumanoidAMP \
  experiment=amp_run_r3 seed=42 max_iterations=4000
run factory_pick_r3 900 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r3 seed=42
run trifinger_r3 700 python train.py task=Trifinger \
  experiment=trifinger_r3 seed=42 num_envs=8192
run allegro_r3 600 python train.py task=AllegroHand \
  experiment=allegro_r3 seed=42
run a1terrain_r3 500 python train.py task=A1Terrain \
  experiment=a1terrain_r3 seed=42
run franka_cabinet_r3 420 python train.py task=FrankaCabinet \
  experiment=franka_cabinet_r3 seed=42
run ant_sac_r3 420 python train.py task=Ant train=AntSAC \
  experiment=ant_sac_r3 seed=42
run franka_cube_r3 420 python train.py task=FrankaCubeStack \
  experiment=franka_cube_r3 seed=42
echo "=== queue complete $(date +%H:%M:%S) ===" >&2
