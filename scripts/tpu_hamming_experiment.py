"""Hamming-matrix formulations at the tracking shape (8192 x 1024):
Pallas XOR+popcount tiles (current dispatch) vs bf16 bit-matmul vs int8
bit-matmul. Exactness cross-checked on device; chained two-point timing.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.ops.hamming import (
    hamming_matrix_bf16,
    hamming_matrix_mxu,
)
from orb_slam_tracking_tpu.ops.pallas_kernels import hamming_matrix_pallas

rng = np.random.default_rng(0)
P, N = 8192, 1024
d1 = jnp.asarray(rng.integers(0, 2**32, (P, 8), dtype=np.uint32))
d2 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))


@jax.jit
def check():
    a = hamming_matrix_pallas(d1, d2)
    b = hamming_matrix_bf16(d1, d2)
    return jnp.max(jnp.abs(a - b)), jnp.sum(a)


diff, _ = check()
print(f"bf16 vs pallas max diff: {int(diff)}", flush=True)

SCAN = 16


def scan_of(f):
    @jax.jit
    def g(x):
        def body(c, _):
            # feed the previous result back in so iterations chain
            d1x = d1 ^ c[:, :1].astype(jnp.uint32)
            out = f(d1x, d2)
            return jnp.sum(out, axis=1, keepdims=True).astype(jnp.uint32) % 2, None
        fin, _ = jax.lax.scan(body, x, None, length=SCAN)
        return fin
    return g


def timed(name, f):
    fn = scan_of(f)
    arg = jnp.zeros((P, 1), jnp.uint32)
    try:
        y = fn(arg)
        _ = float(jnp.sum(y))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:2000]}",
              flush=True)
        return
    xx = arg
    t0 = time.time()
    for _i in range(3):
        xx = fn(xx)
    _ = float(jnp.sum(xx))
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _i in range(9):
        xx = fn(xx)
    _ = float(jnp.sum(xx))
    tb = time.time() - t0
    ms = (tb - ta) / (6 * SCAN) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


timed("pallas_xor", hamming_matrix_pallas)
timed("bf16_matmul", hamming_matrix_bf16)
timed("int8_matmul", hamming_matrix_mxu)
print("done", flush=True)
