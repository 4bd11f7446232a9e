"""Multi-process distributed calibration test (SURVEY.md §2.3, VERDICT r1 #7).

Launches 2 subprocesses x 4 virtual CPU devices each, brings them up with
``jax.distributed.initialize`` via parallel.mesh.distributed_init, runs the
sharded calibration over the GLOBAL 8-device mesh, and asserts the
psum-reduced summary matches this (single-process, 8-device) run bit-close.
This is the CPU-testable shape of a real multi-host TPU pod-slice run.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from _dist_problem import build_problem, tiny_config
from option_pricing_ffn_lbfgs_tpu.parallel.mesh import make_mesh
from option_pricing_ffn_lbfgs_tpu.parallel.sharded import calibrate_sharded

# Runs in the DEFAULT pytest invocation (VERDICT r4 item 7): this is the CPU
# stand-in for the pod-slice capability and must not silently rot. ~60 s
# (two subprocess compiles of the tiny 6-option problem).


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process(tmp_path):
    import jax.numpy as jnp

    # Single-process golden run on this process's own 8-device CPU mesh.
    spots, rate, bs, bm, bc, bp = build_problem(jnp, b=8)
    keys = jax.random.split(jax.random.key(0), 8)
    _, golden = calibrate_sharded(make_mesh(8), spots, rate, bs, bm, bc, bp,
                                  keys, tiny_config(), n_starts=2)
    golden = jax.block_until_ready(golden)
    assert float(golden.mean_loss) < 1e-4  # solves actually converge

    # 2-process x 4-device distributed run of the same problem.
    port = _free_port()
    coord = f"localhost:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_ENABLE_X64="1",
               PYTHONPATH=os.pathsep.join(
                   [repo_root, os.environ.get("PYTHONPATH", "")]))
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    summary = json.loads(outs[0][0].strip().splitlines()[-1])
    assert summary["n_total"] == 8
    assert summary["n_converged"] == int(golden.n_converged)
    np.testing.assert_allclose(summary["mean_loss"],
                               float(golden.mean_loss), rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(summary["mean_rel_error"],
                               float(golden.mean_rel_error), rtol=1e-3,
                               atol=1e-9)
    assert summary["mean_rel_error"] < 1e-3  # prices reproduced
