#!/bin/bash
# Round-5 TPU queue — VERDICT.md items, in order:
#  1. factory_pick_r5  (item 3: Pick to high lift under the fixed guard +
#     contact cap; r4's four silent crashes postmortem'd: TPU worker
#     kernel-fault or remote-compile failure at 512 envs (tunnel limit); stderr
#     now captured into the run dir)
#  2. factory_screw_r5 (item 3: first Screw curve — requires the SCREW
#     dof-map fix, reference trains it "almost immediately")
#  3. factory_place_r5 (item 3: first Place curve ever)
#  4. shadowhand_ff_r5 (item 2: ShadowHandOpenAI_FF + full DR — the
#     reference hand benchmark; round-4's "3.3x DR overhead" was
#     actually controlFrequencyInv=3, so physics is already near
#     parity and the only lever is wall-clock)
#  5. a1terrain_r5    (item 4: retrain after the spawn-depenetration fix
#     that removed the measured 19 rad/s reset catapult)
#  6. amp_walk_r5     (item 6: continue amp_walk_hard_r4 past epoch 425 —
#     sigma anneals with training time; det-eval gap was exploration
#     noise at eval)
set -u
cd /root/repo

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== r5: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  mkdir -p "runs/$name"
  GRACE=${GRACE:-1200} timeout $((total + 900)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "runs/$name/stdout.log" 2>&1
  echo "=== r5: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

rm -rf runs/factory_pick_r5
run factory_pick_r5 3600 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r5 seed=42 num_envs=256 \
  train.params.config.minibatch_size=1024

rm -rf runs/factory_screw_r5
run factory_screw_r5 1500 python train.py task=FactoryTaskNutBoltScrew \
  experiment=factory_screw_r5 seed=42

rm -rf runs/factory_place_r5
run factory_place_r5 1800 python train.py task=FactoryTaskNutBoltPlace \
  experiment=factory_place_r5 seed=42 num_envs=256 \
  train.params.config.minibatch_size=1024

rm -rf runs/shadowhand_ff_r5
run shadowhand_ff_r5 7200 python train.py task=ShadowHandOpenAI_FF \
  experiment=shadowhand_ff_r5 seed=42 max_iterations=5000

rm -rf runs/a1terrain_r5
run a1terrain_r5 1500 python train.py task=A1Terrain \
  experiment=a1terrain_r5 seed=42

rm -rf runs/amp_walk_r5
run amp_walk_r5 1500 python train.py task=HumanoidAMP \
  experiment=amp_walk_r5 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=6000 \
  task.sim.contact_timeconst=0.0 task.sim.friction_timeconst=0.0 \
  checkpoint=runs/amp_walk_hard_r4/nn/best.ckpt

echo "=== r5 queue complete $(date +%H:%M:%S) ===" >&2

# appended (item 7 loose bars): first FrankaCabinet drawer-open attempt at
# a real epoch budget (9.5K fps x 1500s ~ 870 epochs) + first-ever
# FrankaCubeStack curve
rm -rf runs/franka_cabinet_r5
run franka_cabinet_r5 1500 python train.py task=FrankaCabinet \
  experiment=franka_cabinet_r5 seed=42

rm -rf runs/franka_cube_r5
run franka_cube_r5 1200 python train.py task=FrankaCubeStack \
  experiment=franka_cube_r5 seed=42

echo "=== r5 queue appendix complete $(date +%H:%M:%S) ===" >&2
