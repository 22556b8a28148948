"""The examples/ scripts must stay runnable (subprocess, CPU-forced)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(path, timeout=600):
    code = (f"import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"exec(open({path!r}).read())")
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, text=True, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "XLA_FLAGS": ""})


def test_example_custom_pde_layer():
    p = _run("examples/02_custom_pde_layer.py")
    assert p.returncode == 0, p.stdout
    assert "learned alpha" in p.stdout


def test_example_serving():
    p = _run("examples/03_serving.py")
    assert p.returncode == 0, p.stdout
    assert "linearized 3 PDE branches" in p.stdout
    assert "reloaded logits shape (8, 10)" in p.stdout
