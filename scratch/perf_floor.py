"""Measure dispatch floor + queued-iteration timing on the axon TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 128)).astype(np.float32))


@jax.jit
def tiny(x):
    return x + 1.0


def bench(name, f, arg, n_iter=50):
    out = f(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{name:28s} {dt*1e6:10.1f} us/iter")


bench("tiny x+1 (8,128)", tiny, x)

# chained dependent iterations — amortizes dispatch if queue depth allows
@jax.jit
def tiny_chain(x):
    for _ in range(50):
        x = x + 1.0
    return x

bench("tiny chained 50 in one jit", tiny_chain, x)

# big matmul to see achievable TFLOPs
a = jnp.asarray(np.random.default_rng(1).standard_normal((8192, 8192)).astype(np.float32))

@jax.jit
def mm(a):
    return jnp.matmul(a, a, precision=jax.lax.Precision.DEFAULT)

out = mm(a); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = mm(out)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 10
fl = 2 * 8192**3
print(f"matmul 8192^3 DEFAULT        {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TFLOP/s")

@jax.jit
def mmh(a):
    return jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST)

out = mmh(a); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = mmh(out)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 10
print(f"matmul 8192^3 HIGHEST        {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TFLOP/s")

b16 = a.astype(jnp.bfloat16)

@jax.jit
def mmb(a):
    return jnp.matmul(a, a, preferred_element_type=jnp.bfloat16)

out = mmb(b16); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = mmb(out)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 10
print(f"matmul 8192^3 bf16           {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TFLOP/s")
