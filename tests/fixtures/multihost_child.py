"""Child process for the real 2-process jax.distributed test.

Run by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID set — the same env contract train.py
--distributed uses (videoswap_tpu/parallel/dist.py). Executes:

1. process-group init through dist.maybe_initialize_distributed();
2. three data-parallel train steps of a small MLP over a GLOBAL mesh
   spanning both processes (each process contributes different local
   data; GSPMD inserts the cross-process grad psum) — params must end
   identical on both processes;
3. gated IO: set_path_logger + save_adapter_checkpoint must only touch
   the filesystem on process 0;
4. dist.barrier() — a real cross-host collective.

Writes a JSON report (losses, param checksum, io flags) per process.
"""

import json
import os
import sys

sys.path.insert(0, os.environ['VS_REPO'])

import jax                                                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')                     # noqa: E402

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402
from jax.sharding import (Mesh, NamedSharding,                # noqa: E402
                          PartitionSpec as P)

from videoswap_tpu.builders import save_adapter_checkpoint    # noqa: E402
from videoswap_tpu.parallel import dist                      # noqa: E402
from videoswap_tpu.utils.logger import set_path_logger        # noqa: E402


def main():
    out_dir = os.environ['VS_OUT']
    assert dist.maybe_initialize_distributed(flag=True)
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, nproc
    devs = np.asarray(jax.devices())
    assert len(devs) == 4, devs          # 2 local x 2 processes
    mesh = Mesh(devs.reshape(4), ('dp',))

    # global batch sharded over dp: each process fills only ITS local
    # shards, with process-dependent data — the grad psum is then a real
    # cross-process collective, not a replicated no-op.
    n, d = 16, 8
    rs = np.random.RandomState(0)          # same GLOBAL data on both
    x_all = rs.randn(n, d).astype(np.float32)
    y_all = rs.randn(n, 1).astype(np.float32)
    sh = NamedSharding(mesh, P('dp'))
    x = jax.make_array_from_callback((n, d), sh,
                                     lambda idx: x_all[idx])
    y = jax.make_array_from_callback((n, 1), sh,
                                     lambda idx: y_all[idx])

    w = jnp.zeros((d, 1))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            pred = x @ w
            return jnp.mean((pred - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    w = jax.device_put(w, rep)
    losses = []
    for _ in range(3):
        w, loss = step(w, x, y)
        losses.append(float(loss))

    # a second explicit collective: global mean of a process-dependent
    # value must agree on both processes
    local = jax.make_array_from_callback(
        (4,), NamedSharding(mesh, P('dp')),
        lambda idx: np.full((1,), float(pid) + 1.0, np.float32))
    gmean = float(jax.jit(jnp.mean, out_shardings=rep)(local))

    # gated IO (what train.py --distributed relies on): each process aims
    # at its OWN directory/file, so a wrongly-ungated process 1 would
    # leave visible droppings
    cfg = os.path.join(out_dir, f'cfg_{pid}.yml')
    with open(cfg, 'w') as f:
        f.write('name: mh\n')
    proot = os.path.join(out_dir, f'p{pid}')
    paths = set_path_logger(proot, cfg, {'name': 'mh'}, is_train=True)
    ckpt = os.path.join(out_dir, f'adapter_p{pid}.msgpack')
    save_adapter_checkpoint(ckpt, {'w': w})

    dist.barrier('end')
    report = dict(pid=pid, losses=losses, gmean=gmean,
                  w_sum=float(jnp.sum(jnp.abs(w))),
                  exp_root_exists=os.path.exists(paths['exp_root']),
                  ckpt_exists=os.path.exists(ckpt),
                  main=dist.is_main_process())
    with open(os.path.join(out_dir, f'report_{pid}.json'), 'w') as f:
        json.dump(report, f)
    print('child done', pid, flush=True)


if __name__ == '__main__':
    main()
