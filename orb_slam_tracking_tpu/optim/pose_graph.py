"""Sim(3) pose-graph (essential-graph) optimization.

TPU-native realization of the loop-closing optimizer the reference
vendors g2o for: ``VertexSim3Expmap`` / ``EdgeSim3``
(``Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h:48,152``) as used by
ORB-SLAM's ``Optimizer::OptimizeEssentialGraph`` — keyframe poses become
Sim(3) vertices so accumulated monocular scale drift is absorbed along
the loop, edges are relative-Sim(3) measurements (spanning tree,
covisibility, loop edges), and the graph is solved by LM.

Design (vs the reference's sparse pointer graph):
- vertices are a *batched* ``Sim3`` pytree ``[K]`` over fixed-capacity
  keyframe slots with a validity mask — no heap graph;
- edges are COO arrays ``(ei, ej, measurement, weight)`` with zero-weight
  padding rows, so the whole solve compiles once for a capacity;
- the per-edge residual is ``log(S_meas^-1 o S_i o S_j^-1)`` under
  left-multiplicative vertex increments ``S_k <- exp(x_k) o S_k``, and the
  full Jacobian is taken with ``jax.jacfwd`` through the closed-form
  ``sim3_exp``/``sim3_log`` — at 7K <= a few hundred state dims the dense
  normal equations are a single small MXU Cholesky, which beats any
  sparse-elimination translation on this hardware;
- gauge freedom is removed by a ``fixed`` vertex mask (ORB-SLAM fixes the
  loop keyframe, ``Optimizer.cc OptimizeEssentialGraph``): fixed/invalid
  columns of J are zeroed and their diagonal pinned, so their increment
  is exactly zero.

The LM loop is a fixed-length ``lax.scan`` with Nielsen damping and
accept/reject masking (same stance as ``optim/lm.py``: no data-dependent
early exit on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

from ..geometry.sim3 import (
    Sim3, sim3_compose, sim3_exp, sim3_inverse, sim3_log,
)
from .lm import nielsen_update

__all__ = ["PoseGraphResult", "optimize_pose_graph", "relative_sim3"]


class PoseGraphResult(NamedTuple):
    vertices: Sim3          # [K] optimized Siw
    cost0: jnp.ndarray      # scalar initial weighted chi2
    cost: jnp.ndarray       # scalar final weighted chi2


def relative_sim3(gi: Sim3, gj: Sim3) -> Sim3:
    """Edge measurement ``S_ij = S_i o S_j^-1`` from two vertex estimates
    (how ORB-SLAM builds spanning-tree/covisibility edge measurements
    from the *pre-correction* poses)."""
    return sim3_compose(gi, sim3_inverse(gj))


def _gather(g: Sim3, idx: jnp.ndarray) -> Sim3:
    return Sim3(s=g.s[idx], R=g.R[idx], t=g.t[idx])


def _residuals(vertices: Sim3, meas_inv: Sim3, ei, ej) -> jnp.ndarray:
    """[E, 7] per-edge log residuals."""
    gi = _gather(vertices, ei)
    gj = _gather(vertices, ej)
    return sim3_log(sim3_compose(meas_inv, sim3_compose(gi, sim3_inverse(gj))))


def _perturbed(base: Sim3, x: jnp.ndarray) -> Sim3:
    """Left-multiplicative batched update: ``exp(x_k) o base_k``."""
    return sim3_compose(sim3_exp(x), base)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    vertices: Sim3,        # [K] initial Siw (world->camera similarities)
    v_valid: jnp.ndarray,  # [K] bool
    fixed: jnp.ndarray,    # [K] bool — gauge-fixed vertices (>=1 required)
    ei: jnp.ndarray,       # [E] int32 edge source vertex
    ej: jnp.ndarray,       # [E] int32 edge target vertex
    meas: Sim3,            # [E] measured S_ij (padding rows arbitrary)
    e_w: jnp.ndarray,      # [E] float32 edge weight, 0 = padding
    iterations: int = 20,
) -> PoseGraphResult:
    """LM over the Sim(3) pose graph; returns optimized vertices.

    Invalid vertices are treated as fixed (zero increment). Edge weights
    scale the whole 7-vector residual (ORB-SLAM uses the identity
    information matrix scaled per edge-type implicitly via inclusion).
    """
    K = vertices.s.shape[0]
    E = ei.shape[0]
    meas_inv = sim3_inverse(meas)
    frozen = fixed | ~v_valid                       # [K]
    col_free = jnp.repeat(~frozen, 7).astype(jnp.float32)   # [7K]
    sqrt_w = jnp.sqrt(jnp.maximum(e_w, 0.0))

    def weighted_resid_flat(x_flat: jnp.ndarray, base: Sim3) -> jnp.ndarray:
        x = x_flat.reshape(K, 7)
        r = _residuals(_perturbed(base, x), meas_inv, ei, ej)   # [E, 7]
        return (sqrt_w[:, None] * r).reshape(E * 7)

    def cost_of(base: Sim3) -> jnp.ndarray:
        r = _residuals(base, meas_inv, ei, ej)
        return jnp.sum(e_w[:, None] * r * r)

    zero_x = jnp.zeros(K * 7, jnp.float32)

    def step(carry, _):
        base, lam, nu, cost = carry
        # linearize at the current estimate (x = 0)
        r = weighted_resid_flat(zero_x, base)                     # [7E]
        J = jax.jacfwd(weighted_resid_flat)(zero_x, base)         # [7E, 7K]
        J = J * col_free[None, :]                                 # gauge fix
        H = jnp.matmul(J.T, J, precision=_HI)
        b = jnp.matmul(J.T, r, precision=_HI)
        # pin frozen columns so H stays SPD and their increment is 0; the
        # small absolute floor keeps the Cholesky finite even if a free
        # coordinate has exactly zero curvature (degenerate edge Jacobian),
        # so LM degrades gracefully instead of rejecting every step
        diag_pin = jnp.where(col_free > 0, 0.0, 1.0)
        Hd = H + jnp.diag(lam * jnp.diagonal(H) + diag_pin + 1e-9)
        dx = -jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(Hd, lower=True), True), b)
        cand = _perturbed(base, dx.reshape(K, 7))
        new_cost = cost_of(cand)
        pred = -jnp.dot(dx, 0.5 * (b - lam * jnp.diagonal(H) * dx))
        rho = (cost - new_cost) / jnp.maximum(pred, 1e-12)
        good = (new_cost < cost) & jnp.isfinite(new_cost)
        lam_new, nu_new = nielsen_update(lam, nu, jnp.where(good, rho, -1.0))
        base = jax.tree.map(
            lambda a, c: jnp.where(
                good.reshape((1,) * a.ndim), c, a), base, cand)
        cost = jnp.where(good, new_cost, cost)
        return (base, lam_new, nu_new, cost), None

    cost0 = cost_of(vertices)
    (opt, _, _, cost), _ = jax.lax.scan(
        step,
        (vertices, jnp.float32(1e-6), jnp.float32(2.0), cost0),
        None, length=iterations,
    )
    return PoseGraphResult(vertices=opt, cost0=cost0, cost=cost)
