"""Real multi-process distributed BA (SURVEY.md §5.8 / §4).

Launches TWO separate Python processes that form a JAX process group over
a localhost coordinator (the same ``jax.distributed.initialize`` path a
multi-host TPU pod uses, on the CPU backend), run the point-sharded
Schur-complement BA across the 2-device global mesh, and must agree with
the single-process solution to 1e-3. This is the multi-host story the
virtual single-process mesh cannot exercise: process-group bring-up,
cross-process collectives, global-array construction from process-local
shards."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.optim.ba import bundle_adjust
from orb_slam_tracking_tpu.utils.synthetic import synthetic_ba_problem

_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_ba_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_ba_matches_single_process(tmp_path):
    nK, nP = 8, 512
    pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv, K = synthetic_ba_problem(
        0xBA, nK, nP
    )
    O = nK * nP
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    ref = bundle_adjust(
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K), iterations=10,
    )

    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers pin CPU via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "2", str(i), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    z0 = np.load(outs[0])
    z1 = np.load(outs[1])
    assert int(z0["process_count"]) == 2
    # replicated outputs agree across processes bit-for-bit
    np.testing.assert_array_equal(z0["kf_R"], z1["kf_R"])
    np.testing.assert_array_equal(z0["kf_t"], z1["kf_t"])
    # parity with the single-process dense solution
    assert abs(float(z0["cost"]) - float(ref.cost)) / float(ref.cost) < 1e-3
    np.testing.assert_allclose(z0["kf_t"], np.asarray(ref.kf_t), atol=1e-3)
    np.testing.assert_allclose(z0["kf_R"], np.asarray(ref.kf_R), atol=1e-3)
    # the two point shards tile the full set and match the reference
    pts_all = np.zeros((nP, 3), np.float32)
    seen = np.zeros(nP, bool)
    for z in (z0, z1):
        pts_all[z["local_idx"]] = z["local_pts"]
        seen[z["local_idx"]] = True
    assert seen.all()
    np.testing.assert_allclose(pts_all, np.asarray(ref.pts), atol=5e-3)
