"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from videoswap_tpu.parallel import make_mesh, param_sharding_rules


def test_mesh_shapes():
    mesh = make_mesh((1, 8, 1))
    assert mesh.axis_names == ('dp', 'sp', 'tp')
    assert mesh.devices.shape == (1, 8, 1)


def test_param_sharding_rules():
    from jax.sharding import PartitionSpec as P

    class Leaf:
        ndim = 2
    assert param_sharding_rules(('attn1', 'to_q', 'kernel'),
                                Leaf()) == P(None, 'tp')
    assert param_sharding_rules(('ff', 'net_2', 'kernel'),
                                Leaf()) == P('tp', None)
    assert param_sharding_rules(('conv1', 'conv2d', 'kernel'),
                                type('L', (), {'ndim': 4})()) == P()


def test_dryrun_multichip_executes():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_abstractly():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 8, 32, 32, 4)
