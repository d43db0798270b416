"""Orbax checkpoint backend (utils/checkpointing.py): roundtrip,
retention pruning, and sharding-aware restore on the virtual 8-device
mesh. The msgpack parity path is covered by test_cli_e2e / builders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoswap_tpu.utils.checkpointing import (CheckpointManager,
                                               restore_pytree, save_pytree)


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        'adapter': {'w': jnp.asarray(rs.randn(8, 16), jnp.float32),
                    'b': jnp.asarray(rs.randn(16), jnp.bfloat16)},
        'opt_state': {'mu': jnp.asarray(rs.randn(8, 16), jnp.float32),
                      'count': jnp.asarray(3, jnp.int32)},
        'global_step': 7,
    }


def _assert_trees_equal(a, b):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_manager_roundtrip_and_retention(tmp_path):
    tree = _tree()
    with CheckpointManager(str(tmp_path / 'ckpt'), max_to_keep=2) as mgr:
        for step in (10, 20, 30):
            t = dict(tree, global_step=step)
            mgr.save(step, t, wait=True)
        assert mgr.latest_step() == 30

        out = mgr.restore(template=dict(tree, global_step=0))
        assert int(out['global_step']) == 30
        _assert_trees_equal(out['adapter'], tree['adapter'])
        # dtypes come back exactly (bf16 leaf stays bf16)
        assert out['adapter']['b'].dtype == jnp.bfloat16

        # retention: only the last 2 steps survive
        mgr.wait_until_finished()
        assert set(mgr._mgr.all_steps()) == {20, 30}

        # restoring a pruned step fails loudly
        with pytest.raises(Exception):
            mgr.restore(step=10, template=tree)


def test_oneshot_roundtrip(tmp_path):
    tree = _tree(1)
    save_pytree(str(tmp_path / 'one'), tree)
    out = restore_pytree(str(tmp_path / 'one'), template=tree)
    _assert_trees_equal(out, tree)
    # template-free restore gives back plain arrays too
    raw = restore_pytree(str(tmp_path / 'one'))
    _assert_trees_equal(raw['adapter'], tree['adapter'])


def test_sharded_restore_places_shards(tmp_path):
    """Restore directly into a (dp, tp) sharded layout: each leaf lands
    with the requested sharding and the values match — the multi-chip
    resume path (no full-tensor host staging)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ('dp', 'tp'))
    sh_w = NamedSharding(mesh, P('dp', 'tp'))
    sh_b = NamedSharding(mesh, P('tp'))

    rs = np.random.RandomState(2)
    w = jax.device_put(jnp.asarray(rs.randn(16, 8), jnp.float32), sh_w)
    b = jax.device_put(jnp.asarray(rs.randn(8), jnp.float32), sh_b)
    tree = {'w': w, 'b': b, 'step': 5}
    save_pytree(str(tmp_path / 'sharded'), tree)

    template = {
        'w': jax.ShapeDtypeStruct(w.shape, w.dtype, sharding=sh_w),
        'b': jax.ShapeDtypeStruct(b.shape, b.dtype, sharding=sh_b),
        'step': 0,
    }
    out = restore_pytree(str(tmp_path / 'sharded'), template=template)
    assert out['w'].sharding.is_equivalent_to(sh_w, w.ndim)
    assert out['b'].sharding.is_equivalent_to(sh_b, b.ndim)
    np.testing.assert_array_equal(np.asarray(out['w']), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(out['b']), np.asarray(b))
    assert int(out['step']) == 5


def test_train_cli_orbax_backend(tmp_path):
    """train.py with checkpoint_backend: orbax — step-indexed saves at
    save_freq, then --resume restores params+step from the manager
    (in-process CLI drive, same style as test_cli_e2e)."""
    import os
    import sys
    import yaml
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.make_smoke_dataset import make
    from tests.test_cli_e2e import TINY_MODELS

    data_dir = tmp_path / 'data'
    make(str(data_dir), frames=4, size=64)
    cfg = {
        'name': 'smoke_orbax', 'manual_seed': 7, 'mixed_precision': 'no',
        'datasets': {
            'type': 'SingleVideoPointDataset',
            'path': str(data_dir / 'frames'),
            'tap_path': str(data_dir / 'TAP.pth'),
            'prompt': 'a cat walking on a gradient floor',
            'num_frames': 2, 'total_frames': 4,
            'video_transform': [
                {'type': 'Resize', 'size': 64},
                {'type': 'ToTensor'},
                {'type': 'Normalize', 'mean': [0.5], 'std': [0.5]},
            ],
            'batch_size_per_gpu': 1, 'dataset_enlarge_ratio': 4,
        },
        'models': TINY_MODELS, 'path': {},
        'train': {
            'train_pipeline': 'VideoSwapTrainer',
            'optimizer': {'type': 'AdamW', 'lr': 5.0e-4,
                          'weight_decay': 0.01, 'betas': [0.9, 0.999]},
            'tune_cfg': {'drop_rate': 0.2, 'min_timestep': 0.5,
                         'loss_type': 'local'},
            'lr_scheduler': 'constant', 'total_iter': 2,
            'warmup_iter': 0},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 1,
                   'checkpoint_backend': 'orbax', 'max_to_keep': 2},
    }
    cfg_path = tmp_path / 'train_orbax.yml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    import train as train_mod

    class Args:
        opt = str(cfg_path)
        resume = False
    train_mod.train(str(tmp_path), Args())

    odir = tmp_path / 'experiments' / 'smoke_orbax' / 'models' / 'orbax'
    assert odir.is_dir(), 'orbax checkpoint dir not created'
    with CheckpointManager(str(odir)) as mgr:
        assert mgr.latest_step() == 2

    class ResumeArgs:
        opt = str(cfg_path)
        resume = True
    # --resume reuses the exp dir (no archive rename — that would sweep
    # the checkpoints away) and restores step 2, so with total_iter=2 the
    # run completes immediately
    train_mod.train(str(tmp_path), ResumeArgs())
    exp = tmp_path / 'experiments' / 'smoke_orbax'
    assert exp.is_dir() and not list(
        exp.parent.glob('smoke_orbax_archived_*')), \
        'resume must reuse the experiment dir, not archive it'
    logs = sorted(exp.glob('train_smoke_orbax_*.log'))
    text = ''.join(p.read_text() for p in logs)
    assert 'resumed from orbax step 2' in text
