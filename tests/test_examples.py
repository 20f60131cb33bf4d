"""The shipped examples must keep running (the reference's tester.py rotted)."""

import subprocess
import sys

import pytest


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=".",
    )


@pytest.mark.slow
def test_train_ppo_example():
    r = _run(
        ["examples/train_ppo.py", "--env", "DiscreteCarFlag-v0",
         "--num-envs", "32", "--rollout", "8", "--updates", "4",
         "--log-every", "2"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "update" in r.stdout


@pytest.mark.slow
def test_render_demo_example(tmp_path):
    # The two ant-physics configs each take ~2 min of CPU XLA compile even
    # at euler/fs=1/iters=1 (the scalarized engine trace is large); the
    # other five configs are seconds.
    r = _run(["examples/render_demo.py", "--out", str(tmp_path), "--steps", "3",
              "--envs", "2"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "CarFlag-v0.png").exists()
