#!/bin/bash
# Round-4 follow-up queue (runs after queue_r4.sh):
#  - resume shadowhand_r4 past consecutive_successes >= 10 (it reached
#    7.1 at epoch 1144 when the first budget expired, climbing +0.013/ep)
#  - ant_sac_r4: demonstrate the rolling-window best gating (no phantom
#    peak/collapse) on SAC
#  - franka_cabinet_r4: first real curve with the blocked-inverse scene
set -u
cd /root/repo

run() {
  local name="$1"; local total="$2"; shift 2
  echo "=== r4b: $name (budget ${total}s) $(date +%H:%M:%S) ===" >&2
  GRACE=${GRACE:-600} timeout $((total + 900)) scripts/tpu_run.sh \
    "runs/$name/metrics.jsonl" "$total" "$@" \
    > "/tmp/queue_${name}.log" 2>&1
  echo "=== r4b: $name done rc=$? $(date +%H:%M:%S) ===" >&2
}

# AMP hard-contact A/B: the one physics-level divergence from the PhysX
# reference in this task is the MuJoCo-style compliant contact
# (contact_timeconst/friction_timeconst .015). If the discriminator's
# perfect separation feeds on soft-contact transition signatures, hard
# ground contact moves the ep-len trajectory where disc-side knobs did
# not. Joint-limit compliance stays (the humanoid leans on knee stops —
# hard limits broke balance outright in the round-2 Humanoid study).
rm -rf runs/amp_walk_hard_r4
run amp_walk_hard_r4 1200 python train.py task=HumanoidAMP \
  experiment=amp_walk_hard_r4 seed=42 \
  task.env.motion_file=amp_humanoid_walk.npy max_iterations=3000 \
  task.sim.contact_timeconst=0.0 task.sim.friction_timeconst=0.0

rm -rf runs/ant_sac_r4
run ant_sac_r4 800 python train.py task=Ant train=AntSAC \
  experiment=ant_sac_r4 seed=42 max_iterations=2000

rm -rf runs/franka_cabinet_r4
run franka_cabinet_r4 900 python train.py task=FrankaCabinet \
  experiment=franka_cabinet_r4 seed=42

# Factory Pick at 512 envs: our sim has no PhysX 128-env SDF contact-buffer
# cap; 4x the envs at the same per-minibatch size gives the reference's
# ~6M-step budget inside the slot (128 envs ran 588 fps = only ~90 epochs)
rm -rf runs/factory_pick_r4
run factory_pick_r4 1800 python train.py task=FactoryTaskNutBoltPick \
  experiment=factory_pick_r4 seed=42 num_envs=512 \
  train.params.config.minibatch_size=2048

# A1 solver-convergence A/B: r4's run still degenerates slowly
# (rew/step 0 -> -119 over 243 epochs, ~1 env/step hitting the safety
# guard) with 16 cold APGD iterations at 500 Hz. Double iterations +
# warm start to test under-convergence as the energy source.
rm -rf runs/a1_si32_r4
run a1_si32_r4 600 python train.py task=A1Terrain \
  experiment=a1_si32_r4 seed=42 \
  task.sim.num_solver_iterations=32 task.sim.warmstart_solver=true

echo "=== r4b complete $(date +%H:%M:%S) ===" >&2
