"""Worker for the 2-process distributed-BA parity test.

Each process runs this script with the same coordinator address and its
own process id; both construct the identical synthetic problem from the
shared seed (multi-controller SPMD: same program everywhere), form the
global 2-device CPU mesh via ``jax.distributed.initialize``, run the
point-sharded Schur-complement BA, and dump the (replicated) camera
results + cost. The launching test compares against the single-process
solution.

Usage: python multiproc_ba_worker.py COORD NPROC PID OUT.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    # one CPU device per process => the global mesh spans the processes
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    import numpy as np

    from orb_slam_tracking_tpu.parallel.ba_sharded import (
        bucket_observations,
        bundle_adjust_sharded,
    )
    from orb_slam_tracking_tpu.parallel.distributed import (
        global_mesh,
        initialize_from_env,
        make_global_array,
        replicate,
    )
    from orb_slam_tracking_tpu.utils.synthetic import synthetic_ba_problem

    assert initialize_from_env(coord, nproc, pid)
    assert jax.process_count() == nproc
    mesh = global_mesh("points")
    n_dev = len(jax.devices())
    assert n_dev == nproc  # 1 CPU device per process

    nK, nP = 8, 512
    pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv, K = synthetic_ba_problem(
        0xBA, nK, nP
    )
    O = nK * nP
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    per = O // n_dev + 64
    bk, bp, buv, bw, bv = bucket_observations(
        obs_kf, obs_pt, obs_uv, np.ones(O, np.float32), np.ones(O, bool),
        nP, n_dev, per,
    )
    ax = "points"
    R2, t2, X2, cost2 = bundle_adjust_sharded(
        mesh,
        replicate(mesh, kf_R0), replicate(mesh, kf_t0),
        make_global_array(mesh, ax, pts0),
        make_global_array(mesh, ax, bk), make_global_array(mesh, ax, bp),
        make_global_array(mesh, ax, buv), make_global_array(mesh, ax, bw),
        make_global_array(mesh, ax, bv),
        replicate(mesh, fixed), make_global_array(mesh, ax, np.ones(nP, bool)),
        replicate(mesh, K.astype(np.float32)), iterations=10,
    )
    # camera outputs + cost are replicated: every process can fetch them.
    # the point output is sharded: fetch this process's local rows.
    local_pts = np.concatenate(
        [np.asarray(s.data) for s in X2.addressable_shards]
    )
    local_idx = np.concatenate(
        [np.arange(s.index[0].start or 0,
                   s.index[0].stop if s.index[0].stop is not None else nP)
         for s in X2.addressable_shards]
    )
    np.savez(
        out_path,
        kf_R=np.asarray(R2), kf_t=np.asarray(t2),
        cost=np.float64(float(cost2)),
        local_pts=local_pts, local_idx=local_idx,
        process_count=np.int64(jax.process_count()),
    )
    print(f"worker {pid}: cost {float(cost2):.3f}", flush=True)


if __name__ == "__main__":
    main()
