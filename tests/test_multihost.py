"""Multi-host scaffolding (SURVEY.md §5.8): IO happens exactly once.

A true 2-process run needs a coordinator (documented in parallel/dist.py);
here non-main behavior is verified by patching jax.process_index — every
filesystem-touching path must become a no-op on process != 0."""

import os

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
