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


def test_long_video_frame_sharded_matches_single_device():
    """32-frame long-video U-Net (8-frame temporal window, stride 4)
    with the frame axis sharded over sp=8: window gathers cross shard
    boundaries, so GSPMD must insert halo collectives. Output must match
    the unsharded forward."""
    import jax.numpy as jnp
    from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
    from videoswap_tpu.parallel import batch_sharding, make_mesh

    cfg = UNet3DConfig(block_out_channels=(8, 8, 16, 16),
                       attention_head_dim=2, cross_attention_dim=16,
                       norm_num_groups=4, motion_heads=2,
                       motion_window=8, motion_window_stride=4)
    model = AnimateDiffUNet3DModel(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8, 4))
    t = jnp.array([500])
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x, t, text)

    ref = np.asarray(jax.jit(model.apply)(params, x, t, text))

    mesh = make_mesh((1, 8, 1))
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
        got = np.asarray(jax.jit(model.apply)(params, xs, t, text))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
