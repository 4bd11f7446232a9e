"""Worker for the 2-process jax.distributed test (launched by test_distributed).

Each process owns 4 virtual CPU devices; together they form the 8-device
global mesh. Process 0 prints the psum-reduced ShardedSummary as one JSON
line for the parent to compare against its single-process run — the
multi-host bring-up path of SURVEY.md §2.3 (jax.distributed.initialize +
GSPMD collectives), exercised for real instead of existing as dead code.
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    from option_pricing_ffn_lbfgs_tpu.parallel.mesh import (
        distributed_init, make_mesh)
    from option_pricing_ffn_lbfgs_tpu.parallel.sharded import calibrate_sharded

    distributed_init(coordinator=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(__file__))
    from _dist_problem import build_problem, tiny_config

    spots, rate, bs, bm, bc, bp = build_problem(jnp, b=8)
    keys = jax.random.split(jax.random.key(0), 8)
    mesh = make_mesh()  # global mesh over all 8 devices, both processes
    _, summary = calibrate_sharded(mesh, spots, rate, bs, bm, bc, bp, keys,
                                   tiny_config(), n_starts=2)
    summary = jax.block_until_ready(summary)
    if pid == 0:
        print(json.dumps({
            "mean_loss": float(summary.mean_loss),
            "mean_rel_error": float(summary.mean_rel_error),
            "n_converged": int(summary.n_converged),
            "n_total": int(summary.n_total),
        }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
