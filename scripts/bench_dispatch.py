"""Host-side dispatch-cost microbench for the sampling host loop.

The 1-core axon host pays per-call costs on every jitted step dispatch:
pytree flatten of the ~1k-leaf param dict, arg canonicalization, and the
dispatch RPC. 50 steps x that cost is pure wall-clock on the bench. This
measures the host-only share (no TPU work): flatten cost, and dispatch
cost of a trivial jitted fn taking the full param tree.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import bench
    pipe = bench.build_pipeline()
    params = pipe.params
    leaves = jax.tree_util.tree_leaves(params)
    print(f'param leaves: {len(leaves)}', flush=True)

    t0 = time.time()
    n = 200
    for _ in range(n):
        jax.tree_util.tree_flatten(params)
    print(f'tree_flatten: {(time.time() - t0) / n * 1e3:.2f} ms/call',
          flush=True)

    @jax.jit
    def trivial(params, x):
        return x + 1.0

    x = jnp.zeros((8, 8))
    trivial(params, x).block_until_ready()
    t0 = time.time()
    for _ in range(50):
        x = trivial(params, x)
    x.block_until_ready()
    print(f'trivial-jit dispatch w/ params arg: '
          f'{(time.time() - t0) / 50 * 1e3:.2f} ms/call', flush=True)

    @jax.jit
    def trivial2(x):
        return x + 1.0

    trivial2(x).block_until_ready()
    t0 = time.time()
    for _ in range(50):
        x = trivial2(x)
    x.block_until_ready()
    print(f'trivial-jit dispatch no params:     '
          f'{(time.time() - t0) / 50 * 1e3:.2f} ms/call', flush=True)


if __name__ == '__main__':
    main()
