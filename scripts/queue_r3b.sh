#!/bin/bash
# Round-3 phase-2 TPU queue: long runs for the VERDICT priority targets
# (ShadowHand FF successes, Factory pick, AMP imitation continuation,
# Trifinger/Allegro curves, Ant solver-config A/B, A1 seed retry).
set -u
cd /root/repo

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== queue: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  GRACE=600 timeout $((total + 800)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "/tmp/queue_${name}.log" 2>&1
  echo "=== queue: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

fresh() { rm -rf "runs/$1"; }

fresh shadowhand_ff_r3b
run shadowhand_ff_r3b 7200 python train.py task=ShadowHandOpenAI_FF \
  experiment=shadowhand_ff_r3b seed=7
fresh factory_pick_r3
run factory_pick_r3 2700 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r3 seed=42
# continue AMP from the phase-1 checkpoints (epoch counter resumes)
run amp_walk_r3 2400 python train.py task=HumanoidAMP \
  experiment=amp_walk_r3 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=6000 \
  checkpoint=runs/amp_walk_r3/nn/last.ckpt
run amp_run_r3 2400 python train.py task=HumanoidAMP \
  experiment=amp_run_r3 seed=42 max_iterations=6000 \
  checkpoint=runs/amp_run_r3/nn/last.ckpt
fresh trifinger_r3
run trifinger_r3 2400 python train.py task=Trifinger \
  experiment=trifinger_r3 seed=42 num_envs=8192
fresh ant_si12_s42
run ant_si12_s42 700 python train.py task=Ant experiment=ant_si12_s42 \
  seed=42 max_iterations=1500 task.sim.num_solver_iterations=12 \
  task.sim.warmstart_solver=false
fresh ant_r3_s7
run ant_r3_s7 700 python train.py task=Ant experiment=ant_r3_s7 seed=7 \
  max_iterations=1500
run allegro_r3 1800 python train.py task=AllegroHand \
  experiment=allegro_r3 seed=42 checkpoint=runs/allegro_r3/nn/best.ckpt
fresh a1terrain_r3_s7
run a1terrain_r3_s7 900 python train.py task=A1Terrain \
  experiment=a1terrain_r3_s7 seed=7 \
  train.params.config.learning_rate=1e-4
fresh franka_cabinet_r3
run franka_cabinet_r3 1500 python train.py task=FrankaCabinet \
  experiment=franka_cabinet_r3 seed=42
fresh franka_cube_r3
run franka_cube_r3 1500 python train.py task=FrankaCubeStack \
  experiment=franka_cube_r3 seed=42
echo "=== phase-2 queue complete $(date +%H:%M:%S) ===" >&2
