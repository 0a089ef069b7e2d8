"""Micro-bench: sort/gather primitives for ray reordering on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 1920 * 1088


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    k = jax.random.randint(key, (N,), 0, 1 << 21, dtype=jnp.int32)
    data = jax.random.normal(key, (N, 8))
    k = jax.block_until_ready(k)
    data = jax.block_until_ready(data)

    t = timeit(jax.jit(jnp.argsort), k)
    print(f"argsort 2M i32:        {t*1e3:8.2f} ms")

    t = timeit(jax.jit(jnp.sort), k)
    print(f"sort 2M i32:           {t*1e3:8.2f} ms")

    perm = jnp.argsort(k)
    perm = jax.block_until_ready(perm)
    t = timeit(jax.jit(lambda d, p: d[p]), data, perm)
    print(f"gather [2M,8]:         {t*1e3:8.2f} ms")

    t = timeit(jax.jit(lambda d, p: jnp.take(d, p, axis=0)), data, perm)
    print(f"take [2M,8]:           {t*1e3:8.2f} ms")

    t = timeit(jax.jit(
        lambda p: jnp.zeros_like(p).at[p].set(
            jnp.arange(p.shape[0], dtype=p.dtype))), perm)
    print(f"invert perm (scatter): {t*1e3:8.2f} ms")

    # sort with payload via lax.sort pairs
    t = timeit(jax.jit(lambda kk: jax.lax.sort(
        (kk, jnp.arange(N, dtype=jnp.int32)), num_keys=1)), k)
    print(f"lax.sort (k,i):        {t*1e3:8.2f} ms")

    # 64-bit packed single sort
    t = timeit(jax.jit(lambda kk: jnp.sort(
        (kk.astype(jnp.int64) << 21)
        | jnp.arange(N, dtype=jnp.int64))), k)
    print(f"packed i64 sort:       {t*1e3:8.2f} ms")

    # 8-block-row gather: permute at 256-ray block granularity
    blocks = data.reshape(N // 256, 256 * 8)
    bperm = jnp.argsort(k[::256])
    t = timeit(jax.jit(lambda d, p: d[p]), blocks, bperm)
    print(f"block gather [8k,2048]:{t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
