"""Real multi-process ``jax.distributed`` execution (VERDICT r1 item 4).

Two local CPU processes form a 4-device global mesh through a localhost
coordinator (gloo cross-process collectives) and run one sharded Anakin PPO
train step each — exercising the actual pod code path: process-spanning
``Mesh``, ``put_global`` layout of host state, gradient ``pmean`` across
processes.  Plus unit tests of ``distributed_init``'s explicit fallback
contract (a misconfigured multi-host launch must not silently degrade).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from gym_po_tpu.parallel import distributed_init

ON_TPU = jax.devices()[0].platform == "tpu"

_WORKER = r"""
import sys
rank, port = int(sys.argv[1]), sys.argv[2]
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from gym_po_tpu.parallel import distributed_init
distributed_init(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import gym_po_tpu as gpt
from gym_po_tpu.agents import (
    PPOConfig, init_train_state, make_train_step, shard_train_state,
)
from gym_po_tpu.parallel import make_mesh

mesh = make_mesh()  # global: 2 processes x 2 devices
env = gpt.make("HansenTaxi-v4")
cfg = PPOConfig(num_envs=16, rollout_steps=8, epochs=1, minibatches=1,
                hidden=(16,))
net, ts = init_train_state(env, cfg, jax.random.PRNGKey(0))
ts = shard_train_state(ts, mesh)
step = make_train_step(env, net, cfg, mesh)
ts, metrics = step(ts)
loss = float(jax.device_get(metrics["loss"].addressable_data(0)))
assert loss == loss, "NaN loss"  # finite check
print(f"RANK{rank}_LOSS={loss:.6f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.skipif(ON_TPU, reason="multi-process CPU test")
def test_two_process_ppo_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    # the worker script lives in tmp_path, so sys.path[0] is tmp_path, not
    # the repo root — make gym_po_tpu importable explicitly
    repo_root = str(pathlib.Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
    losses = []
    for rank, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if f"RANK{rank}_LOSS=" in ln]
        assert line, out[-2000:]
        losses.append(float(line[0].split("=")[1]))
    # replicated metrics: both ranks must report the SAME finite loss
    assert np.isfinite(losses).all(), losses
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses


def test_distributed_init_bare_call_warns_and_falls_back(monkeypatch):
    def boom(**kw):
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.warns(RuntimeWarning, match="single-process"):
        distributed_init()  # bare: auto-detect failed -> local, with warning


def test_distributed_init_explicit_config_raises(monkeypatch):
    def boom(**kw):
        raise RuntimeError("bad coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="bad coordinator"):
        distributed_init(coordinator_address="example:1", num_processes=2,
                         process_id=0)


def test_distributed_init_explicit_fallback_opt_in(monkeypatch):
    def boom(**kw):
        raise RuntimeError("bad coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.warns(RuntimeWarning, match="single-process"):
        distributed_init(allow_fallback=True, coordinator_address="example:1",
                         num_processes=2, process_id=0)
