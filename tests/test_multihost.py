"""Multi-host scaffolding (SURVEY.md §5.8): IO happens exactly once, and
a REAL 2-process jax.distributed run (coordinator on localhost) syncs
gradients across processes and gates IO to process 0.

The monkeypatched tests verify every filesystem-touching path becomes a
no-op on process != 0; test_real_two_process_run then spawns two actual
CPU processes through the same env contract train.py --distributed uses
(reference analogue: live accelerate DDP, /root/reference/train.py:29-34)."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.builders import (save_adapter_checkpoint,
                                    save_train_state)
from videoswap_tpu.parallel import dist
from videoswap_tpu.utils.logger import set_path_logger


def test_single_process_defaults():
    assert not dist.distributed_requested()
    assert not dist.maybe_initialize_distributed()   # no-op without request
    assert dist.is_main_process()
    dist.barrier()                                   # no-op at 1 process


def test_env_requests_distributed(monkeypatch):
    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'localhost:1234')
    assert dist.distributed_requested()


def test_checkpoint_io_gated_off_main(tmp_path, monkeypatch):
    monkeypatch.setattr(jax, 'process_index', lambda: 1)
    params = {'w': jnp.zeros((2, 2))}
    p1 = tmp_path / 'adapter.msgpack'
    p2 = tmp_path / 'train_state.pkl'
    save_adapter_checkpoint(str(p1), params)
    save_train_state(str(p2), params, {'count': jnp.zeros(())}, 3)
    assert not p1.exists() and not p2.exists()

    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    save_adapter_checkpoint(str(p1), params)
    assert p1.exists()


def test_exp_dir_creation_gated_off_main(tmp_path, monkeypatch):
    monkeypatch.setattr(jax, 'process_index', lambda: 1)
    cfg = tmp_path / 'x.yml'
    cfg.write_text('name: gated\n')
    opt = {'name': 'gated'}
    paths = set_path_logger(str(tmp_path), str(cfg), opt, is_train=True)
    # paths are computed (all processes need them) but nothing is created
    assert not os.path.exists(paths['exp_root'])

    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    opt2 = {'name': 'gated'}
    paths2 = set_path_logger(str(tmp_path), str(cfg), opt2, is_train=True)
    assert os.path.isdir(paths2['models'])


@pytest.mark.slow
def test_real_two_process_run(tmp_path):
    """Two actual processes, jax.distributed.initialize over localhost:
    identical loss streams, cross-process grad psum leaves identical
    params, a global mean over process-dependent shards agrees, and only
    process 0 touched the filesystem."""
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, 'tests', 'fixtures', 'multihost_child.py')
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
            'NUM_PROCESSES': '2',
            'PROCESS_ID': str(pid),
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
            'VS_REPO': repo,
            'VS_OUT': str(tmp_path),
        })
        env.pop('JAX_PLATFORMS', None)   # the child sets platforms itself
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    reports = []
    for pid in range(2):
        with open(tmp_path / f'report_{pid}.json') as f:
            reports.append(json.load(f))
    r0, r1 = reports
    assert r0['main'] and not r1['main']
    # identical loss stream and identical (psum-synced) final params
    np.testing.assert_allclose(r0['losses'], r1['losses'], rtol=1e-6)
    assert r0['losses'][0] > r0['losses'][-1]      # it actually trains
    np.testing.assert_allclose(r0['w_sum'], r1['w_sum'], rtol=1e-6)
    # global mean over per-process values (1.0 on p0 shards, 2.0 on p1):
    # both processes must see the cross-process answer
    assert abs(r0['gmean'] - 1.5) < 1e-6
    assert abs(r1['gmean'] - 1.5) < 1e-6
    # IO gating: process 0 created its exp dir + checkpoint, process 1
    # did not
    assert r0['exp_root_exists'] and r0['ckpt_exists']
    assert not r1['exp_root_exists'] and not r1['ckpt_exists']
