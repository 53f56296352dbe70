"""Two-process data-parallel training on CPU: the multi-host path the
reference drives with torchrun (reference train.py:74-82) exercised for
real — jax.distributed.initialize over localhost, 4 virtual devices per
process (8 global), Runner.train with env-axis sharding, host-0-gated
checkpointing, and cross-process metric agreement."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import isaacgymenvs_tpu
from isaacgymenvs_tpu.learn.runner import Runner
from isaacgymenvs_tpu.utils.config import load_task_config, load_train_config

cfg = load_task_config("Cartpole")
cfg.setdefault("env", {})["numEnvs"] = 64
env = isaacgymenvs_tpu.make(task="Cartpole", num_envs=64, cfg=cfg)
train = load_train_config("CartpolePPO")
train["params"]["config"]["max_epochs"] = 3
train["params"]["config"]["save_frequency"] = 0
logdir = os.path.join(sys.argv[3], f"proc{sys.argv[2]}")
r = Runner(env, train, logdir=logdir, seed=0)
ts = r.train()
# leaves must agree across processes: gather and fingerprint
from jax.experimental import multihost_utils
leaf = jax.tree_util.tree_leaves(ts)[0]
if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
    leaf = multihost_utils.process_allgather(leaf, tiled=True)
print("FPRINT", float(np.abs(np.asarray(leaf)).sum()), flush=True)
print("DONE", sys.argv[2], flush=True)
"""


@pytest.mark.skipif(os.environ.get("ISAACGYMENVS_TPU_SKIP_MULTIHOST"),
                    reason="explicitly disabled")
def test_two_process_dp_train(tmp_path):
    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=4"),
    })

    def attempt(run_dir):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        os.makedirs(run_dir, exist_ok=True)
        procs = [subprocess.Popen(
            [sys.executable, str(w), coord, str(i), str(run_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for i in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        ok = all(p.returncode == 0 for p in procs) and all(
            f"DONE {i}" in out for i, out in enumerate(outs))
        return ok, procs, outs

    # one retry: the coordination-service shutdown barrier can time out
    # under heavy host contention (1-core CI boxes running concurrent
    # jobs); a REAL deadlock — like the host-0-gated collective this
    # test originally caught — fails both attempts deterministically
    ok, procs, outs = attempt(tmp_path / "run1")
    run_dir = tmp_path / "run1"
    if not ok:
        ok, procs, outs = attempt(tmp_path / "run2")
        run_dir = tmp_path / "run2"
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"DONE {i}" in out
    # replicated train-state fingerprints agree across processes
    fps = [float(line.split()[1]) for out in outs
           for line in out.splitlines() if line.startswith("FPRINT")]
    assert len(fps) == 2
    np.testing.assert_allclose(fps[0], fps[1], rtol=1e-5)
    # host-0 gating: only proc0's logdir has checkpoints
    nn0 = run_dir / "proc0" / "nn"
    nn1 = run_dir / "proc1" / "nn"
    assert (nn0 / "final.ckpt").exists()
    assert not (nn1 / "final.ckpt").exists()
