"""The shipped examples run end-to-end (rot protection).

Each example is executed the way a user would run it (runpy as __main__),
on CPU via conftest's platform forcing.  live_view_demo starts an HTTP
server and steps 30 sim-seconds, so it is import-checked only.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(name, as_main=True, argv=()):
    old_argv = sys.argv
    sys.argv = [name, *argv]
    try:
        runpy.run_path(os.path.join(EXAMPLES, name),
                       run_name="__main__" if as_main else "example")
    finally:
        sys.argv = old_argv


def test_readme_demo(capsys):
    _run("readme_demo.py")
    out = capsys.readouterr().out
    assert out.count("t=") >= 9          # one line per sim-second


def test_soft_robot_gait(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # writes soft_robot_gait.html
    _run("soft_robot_gait.py")
    html = tmp_path / "soft_robot_gait.html"
    assert html.exists() and html.stat().st_size > 1000


def test_batched_rl_envs(capsys):
    _run("batched_rl_envs.py")
    out = capsys.readouterr().out
    assert "env-steps/s" in out


def test_live_view_demo_imports():
    _run("live_view_demo.py", as_main=False)


def test_train_walker(capsys):
    _run("train_walker.py")
    out = capsys.readouterr().out
    assert "trained gait" in out


def test_train_ppo(capsys):
    _run("train_ppo.py")
    out = capsys.readouterr().out
    assert "mean rollout return" in out and "improved" in out


def test_train_es(capsys):
    # tiny config: 8 antithetic pairs x 2 envs, 12 generations
    _run("train_es.py", argv=["12", "8", "2"])
    out = capsys.readouterr().out
    assert "ES improved" in out
    first, last = out.rsplit("ES improved ", 1)[1].split(" -> ")
    assert float(last) > float(first), "ES did not improve the return"


def test_magnetic_swarm(capsys):
    # tiny config: 2,000 particles stay on the exact pairwise path on CPU
    _run("magnetic_swarm.py", argv=["2000", "0.004"])
    out = capsys.readouterr().out
    assert "done:" in out and "mean z=" in out


def test_gait_gradient_opt(capsys, monkeypatch):
    # tiny config: interpret-mode kernels, 20 steps, 2 adam iterations
    monkeypatch.setenv("GAIT_STEPS", "20")
    monkeypatch.setenv("GAIT_ITERS", "2")
    _run("gait_gradient_opt.py")
    out = capsys.readouterr().out
    assert "travel over 20 steps" in out and "optimized" in out


def test_distributed_gait_opt(capsys):
    # CPU smoke mode is baked into the example: 2-virtual-device mesh,
    # interpret kernels, 4 steps, 2 adam iterations
    _run("distributed_gait_opt.py")
    out = capsys.readouterr().out
    assert "2-device mesh" in out and "optimized travel" in out


def test_system_id(capsys):
    # CPU smoke mode is baked into the example (tiny beam, interpret
    # kernels, 3 adam iterations); the loss-drop assert is in-script
    _run("system_id.py")
    out = capsys.readouterr().out
    assert "system id: loss" in out and "stiffness error" in out


def test_train_backprop_policy(capsys, monkeypatch):
    # tiny config: 2 envs, 2 segments x 10 steps, 1 adam iteration
    monkeypatch.setenv("SHAC_ENVS", "2")
    monkeypatch.setenv("SHAC_SEGMENTS", "2")
    monkeypatch.setenv("SHAC_SEG_STEPS", "10")
    monkeypatch.setenv("SHAC_ITERS", "1")
    _run("train_backprop_policy.py")
    out = capsys.readouterr().out
    assert "backprop-through-physics policy" in out
