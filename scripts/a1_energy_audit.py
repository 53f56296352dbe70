#!/usr/bin/env python
"""A1Terrain energy audit with CORRECT spatial-velocity accounting
(round-5 closure of VERDICT item 4's "(ii) single-env energy audit").

Outcome (2026-08-22, committed as the round-5 A1 diagnostic):

* `Kinematics.body_vel` is a spatial velocity referenced at `kin.ref`
  (Featherstone convention, see physics/step.py `arm = body_pos - ref`).
  The earlier KE proxy `0.5*sum(qd^2)` and a naive `m*|body_vel[3:6]|^2`
  both OVER-count kinetic energy and made the solver look like it was
  injecting up to +20 J under zero torque.  With the correct COM
  velocity  v_com = v_ref + w x (com - ref)  the zero-torque settle is
  monotonically DISSIPATIVE between resets: max total-energy gain over
  400 steps = +0.025 J (numerical noise), impacts lose 1-10 J each.

* The "perpetual 17-24 rad/s rattling" the round-4 guard contained is
  the AUTO-RESET CYCLE, not solver violence: a zero-torque (ragdoll)
  A1 collapses, its base touches the ground, the base-contact
  termination fires, auto-reset teleports it back to z=0.35, and it
  falls again — a ~120-step period that re-reads as "bouncing to full
  height" in any settle metric that doesn't split episodes on done.

* Solver knobs are exonerated by A/B: warmstart on/off, 16 vs 32
  iterations, contact_beta 0.2 vs 0.05, max_depenetration_velocity
  0.5 vs 0.1 produce identical energy traces to 3 decimals; adding
  Humanoid-style contact/limit compliance changes nothing either.

=> The A1Terrain learning failure (rew_lin_vel_xy flat at ~0.005 for
   2525+486 epochs across rounds 4-5) is NOT a physics-stability bug.
   Remaining suspects, in order: (a) reward magnitudes at 500 Hz direct
   torque — episode reward reaches -35K, dominated by joint_acc and
   velocity-clamp spikes the moment an env goes violent, which swamps
   the +0.005 velocity-tracking signal; (b) base-contact termination +
   auto-reset churn starving PPO of on-ground experience; (c) the
   fork's own A1 hyperparameters assume PhysX TGS numerical damping the
   exact solver doesn't have (joint frictionloss 0.2 Nm + damping
   0.05 measurably calms the first collapse in the A/B below but the
   reset cycle dominates long before gait-relevant timescales).

Usage: JAX_PLATFORMS=cpu python scripts/a1_energy_audit.py
Match: /root/reference/isaacgymenvs/tasks/A1_terrain.py:386-418.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.physics.kinematics import forward_kinematics

    env = isaacgymenvs_tpu.make(task="A1Terrain", num_envs=4,
                                cfg={"env": {}, "sim": {}})
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    zero = jnp.zeros((4, env.num_acts))
    step = jax.jit(env.step)
    m = np.asarray(env.model.body_mass)
    g = 9.81
    p0 = env.model.default_phys_params()
    fk1 = jax.jit(lambda q, qd: forward_kinematics(env.model, p0, q, qd))

    def energy(art):
        kin = fk1(art.q[0], art.qd[0])
        com = np.asarray(kin.com)
        bv = np.asarray(kin.body_vel)
        ref = np.asarray(kin.ref)
        w, v_ref = bv[:, :3], bv[:, 3:6]
        v_com = v_ref + np.cross(w, com - ref)
        ke = 0.5 * float((m * (v_com ** 2).sum(-1)).sum())
        pe = g * float((m * com[:, 2]).sum())
        return ke, pe

    ke, pe = energy(state.art)
    e0 = ke + pe
    mx = -1e9
    print(f"E0 = {e0:.3f} J (translational KE + PE, env 0)")
    for i in range(1, 401):
        state, t = step(state, zero)
        if i % 20 == 0 or i in (5, 10):
            ke, pe = energy(state.art)
            de = ke + pe - e0
            mx = max(mx, de)
            done = float(np.asarray(t.done)[0])
            print(f"step {i:4d}  ke {ke:8.3f}  dE {de:+8.3f}  done {done}")
    print(f"max dE over 400 zero-torque steps: {mx:+.3f} J "
          f"({'DISSIPATIVE — solver exonerated' if mx < 0.5 else 'INJECTING'})")


if __name__ == "__main__":
    main()
