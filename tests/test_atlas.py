"""Atlas subsystem: hash encoding, IMLP, loss semantics, mini training run,
displacement propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoswap_tpu.atlas import IMLP, hash_encode
from videoswap_tpu.atlas import losses
from videoswap_tpu.atlas.trainer import AtlasTrainer


def test_hash_encode_shapes_and_continuity(rng):
    table = jax.random.normal(rng, (4, 512, 2))
    x = jnp.asarray([[0.3, 0.7], [0.3001, 0.7001], [-0.2, 0.5]])
    out = hash_encode(x, table, base_resolution=4, per_level_scale=1.5)
    assert out.shape == (3, 8)
    # bilinear interpolation -> nearby points give nearby features
    assert float(jnp.abs(out[0] - out[1]).max()) < 0.05
    assert np.isfinite(np.asarray(out)).all()


def test_imlp_variants(rng):
    for pe, in_dim in (('none', 3), ('encoding', 3), ('hash_encoding', 2)):
        net = IMLP(input_dim=in_dim, output_dim=2, hidden_dim=16,
                   mlp_layers=3, pe_type=pe, pe_dim=4,
                   log2_hashmap_size=8, hash_levels=4)
        x = jax.random.normal(rng, (5, in_dim))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (5, 2)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh output


def test_rigidity_loss_minimal_for_isometry():
    """uv = scale * xy (the pretraining target) has J = I -> loss = 2*sqrt2
    (plus epsilon terms)."""
    larger = 16
    scale = 0.8

    def norm_s(v):
        return v / (larger / 2.0) - 1.0

    def norm_t(v):
        return v / 2.0 - 1.0

    def uv_map(xyt):
        return xyt[:, :2] * scale

    xyf = jnp.asarray([[8, 8, 1], [4, 12, 0]])
    xyt = jnp.stack([norm_s(xyf[:, 0] * 1.0), norm_s(xyf[:, 1] * 1.0),
                     norm_t(xyf[:, 2] * 1.0)], -1)
    uv = uv_map(xyt)
    loss = losses.rigidity_loss(xyf, uv, uv_map, 1, larger, scale,
                                norm_s, norm_t)
    np.testing.assert_allclose(float(loss), 2 * np.sqrt(2), rtol=0.01)


def test_flow_loss_zero_for_consistent_mapping():
    """A mapping that is constant in time has zero flow loss under zero
    flow."""
    f_, h, w = 3, 8, 8

    def norm_s(v):
        return v / 4.0 - 1.0

    def norm_t(v):
        return v / (f_ / 2.0) - 1.0

    def uv_map(xyt):
        return xyt[:, :2] * 0.5

    flows = jnp.zeros((f_, h, w, 2))
    masks = jnp.ones((f_, h, w))
    xyf = jnp.asarray([[2, 3, 1], [5, 5, 1]])
    xyt = jnp.stack([norm_s(xyf[:, 0] * 1.0), norm_s(xyf[:, 1] * 1.0),
                     norm_t(xyf[:, 2] * 1.0)], -1)
    uv = uv_map(xyt)
    loss = losses.optical_flow_loss(xyf, uv, uv_map, flows, masks, flows,
                                    masks, 8, 0.5, norm_s, norm_t)
    assert float(loss) < 1e-5


def _synthetic_data(f=4, h=16, w=16):
    rs = np.random.RandomState(0)
    video = np.zeros((f, h, w, 3), np.float32)
    mask = np.zeros((f, h, w), np.float32)
    for i in range(f):
        video[i, :, :, 0] = np.linspace(0, 1, w)[None, :]
        video[i, :, :, 1] = np.linspace(0, 1, h)[:, None]
        cx = 4 + 2 * i
        video[i, 6:10, cx - 2:cx + 2] = [0.9, 0.2, 0.1]
        mask[i, 6:10, cx - 2:cx + 2] = 1.0
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    dx[:, :, :-1] = video[:, :, 1:] - video[:, :, :-1]
    dy[:, :-1] = video[:, 1:] - video[:, :-1]
    flows = np.zeros((f, h, w, 2), np.float32)
    flows[:-1, :, :, 0] = 0.0
    flows_rev = np.zeros_like(flows)
    fm = np.zeros((f, h, w), np.float32)
    fm[:-1] = 1
    fmr = np.zeros_like(fm)
    fmr[1:] = 1
    _ = rs
    return dict(video=video, mask=mask, dx=dx, dy=dy, flows=flows,
                flows_rev=flows_rev, flow_masks=fm, flow_masks_rev=fmr)


TRAIN_OPT = {
    'optimizer': {'lr': 1e-3},
    'uv_mapping_scale': 0.8,
    'sample_batch_size': 256,
    'derivative_amount': 1,
    'global_derivative_amount': 4,
    'pretrain_alpha_iter': 100,
    'pretrain_global_rigidity_iter': 5,
    'loss_cfg': {
        'reconstruction_loss': {'rgb_loss_weight': 5000,
                                'gradient_loss_weight': 1000,
                                'alpha_loss_weight': 2000},
        'sparsity_loss': {'sparsity_loss_weight': 1000},
        'rigidity_loss': {'rigidity_loss_weight': 1,
                          'global_rigidity_fg_loss_weight': 5,
                          'global_rigidity_bg_loss_weight': 50},
        'flow_loss': {'flow_loss_weight': 5, 'alpha_flow_loss_weight': 49},
    },
}


@pytest.fixture()
def atlas_setup():
    nets = {
        'FG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=32,
                              mlp_layers=3),
        'BG_UV_Mapping': IMLP(input_dim=3, output_dim=2, hidden_dim=32,
                              mlp_layers=3),
        'F_Alpha': IMLP(input_dim=3, output_dim=1, hidden_dim=32,
                        mlp_layers=3, pe_type='encoding', pe_dim=2),
        'F_Atlas': IMLP(input_dim=2, output_dim=3, hidden_dim=32,
                        mlp_layers=3, pe_type='hash_encoding',
                        hash_levels=4, log2_hashmap_size=10),
        'FG_UV_Mapping_Inverse': IMLP(input_dim=3, output_dim=3,
                                      hidden_dim=32, mlp_layers=3),
    }
    data_np = _synthetic_data()
    data = {k: jnp.asarray(v) for k, v in data_np.items()}
    trainer = AtlasTrainer(nets=nets, data=data, train_opt=TRAIN_OPT,
                           larger_dim=16, num_frames=4)
    params = trainer.init_params(jax.random.PRNGKey(0))
    return trainer, params, data_np


def test_atlas_training_reduces_loss(atlas_setup):
    trainer, params, _ = atlas_setup
    for name in ('FG_UV_Mapping', 'BG_UV_Mapping'):
        params, _ = trainer.pretrain_mapping(params, name,
                                             jax.random.PRNGKey(1), iters=3,
                                             batch=256)
    opt_state = trainer.init_opt_state(params)
    rng = jax.random.PRNGKey(2)
    first = last = None
    for step in range(1, 31):
        rng, k1, k2 = jax.random.split(rng, 3)
        params, opt_state, ld = trainer.step(params, opt_state, k1, step)
        params, opt_state, inv_loss = trainer.inverse_step(params,
                                                           opt_state, k2)
        t = float(ld['total_loss'])
        first = t if first is None else first
        last = t
    assert np.isfinite(last) and np.isfinite(float(inv_loss))
    assert last < first, f'loss did not decrease: {first} -> {last}'

    # PSNR evaluation runs and returns a finite value
    from videoswap_tpu.atlas.evaluate import evaluate_model
    p = evaluate_model(trainer.nets, params, atlas_setup[2]['video'],
                       16, 16, 4, trainer.norm_s, trainer.norm_t)
    assert np.isfinite(p) and p > 0


def test_atlas_run_steps_scanned(atlas_setup):
    """run_steps (one scanned dispatch per log interval — what the
    train_atlas.py driver uses) trains equivalently to the host loop:
    finite decreasing loss, inverse loss included, params advanced."""
    trainer, params, _ = atlas_setup
    opt_state = trainer.init_opt_state(params)
    rng = jax.random.PRNGKey(3)

    rng, k = jax.random.split(rng)
    params, opt_state, ld = trainer.run_steps(params, opt_state, k, 0, 10)
    first = float(ld['total_loss'])
    assert 'fg_inv_loss' in ld and np.isfinite(float(ld['fg_inv_loss']))
    for i in range(1, 4):
        rng, k = jax.random.split(rng)
        params, opt_state, ld = trainer.run_steps(params, opt_state, k,
                                                  10 * i, 10)
    last = float(ld['total_loss'])
    assert np.isfinite(last)
    assert last < first, f'scanned loss did not decrease: {first} -> {last}'


def test_atlas_sharded_step_matches_single_device(atlas_setup):
    """dp-sharded atlas training (VERDICT r03 missing #3): the 8-device
    point-batch sharding must reproduce the single-device step exactly —
    same rng => same sampled coordinates, the only difference is WHERE the
    reduction over points runs (GSPMD psum vs local). Checks loss dict,
    updated params, and the inverse-mapping step."""
    from videoswap_tpu.parallel import make_mesh

    trainer, params, data_np = atlas_setup
    opt_state = trainer.init_opt_state(params)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    p_ref, o_ref, ld_ref = trainer.step(
        jax.tree.map(jnp.copy, params),
        jax.tree.map(jnp.copy, opt_state), k1, 1)
    p_ref, o_ref, inv_ref = trainer.inverse_step(p_ref, o_ref, k2)

    sh_trainer = AtlasTrainer(
        nets=trainer.nets, data=trainer.data, train_opt=TRAIN_OPT,
        larger_dim=16, num_frames=4, mesh=make_mesh((8, 1, 1)))
    sh_params = sh_trainer._replicate(jax.tree.map(jnp.copy, params))
    sh_opt = sh_trainer._replicate(jax.tree.map(jnp.copy, opt_state))
    p_sh, o_sh, ld_sh = sh_trainer.step(sh_params, sh_opt, k1, 1)
    p_sh, o_sh, inv_sh = sh_trainer.inverse_step(p_sh, o_sh, k2)

    for name in ld_ref:
        np.testing.assert_allclose(float(ld_sh[name]), float(ld_ref[name]),
                                   rtol=5e-5, err_msg=f'loss {name}')
    np.testing.assert_allclose(float(inv_sh), float(inv_ref), rtol=5e-5)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_sh):
        # atol 3e-5: the hash-table grad is a scatter-add whose partial
        # sums reduce in a different order under dp (psum of shards);
        # Adam amplifies that fp32 jitter on near-zero entries (observed
        # 6/8192 elements off by <=1.3e-5 at init scale ~1e-4)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]),
            rtol=1e-4, atol=3e-5,
            err_msg=f'param {jax.tree_util.keystr(path)}')

    # scanned driver path under the mesh too (what train_atlas.py runs)
    p2, o2, ld2 = sh_trainer.run_steps(p_sh, o_sh, jax.random.PRNGKey(10),
                                       1, 5)
    assert np.isfinite(float(ld2['total_loss']))


def test_propagation_flow(atlas_setup):
    trainer, params, _ = atlas_setup
    from videoswap_tpu.atlas.propagate import (bind_nets,
                                               propagate_point_sequence)
    fg, inv, alpha = bind_nets(trainer.nets, params)
    tracks = np.full((4, 2, 2), 5.0, np.float32)
    out = propagate_point_sequence(
        {'p0': [6, 5]}, {'p0': [8, 7]}, 1, tracks, {'p0': 0, 'p1': 1},
        fg, inv, alpha, 16, 4, trainer.norm_s, trainer.norm_t)
    assert out.shape == (4, 2, 2)
    # untouched point keeps its track
    np.testing.assert_allclose(out[:, 1], 5.0)
    assert np.isfinite(out).all()


def test_atlas_texture_and_checker_renders(atlas_setup):
    trainer, params, data_np = atlas_setup
    from videoswap_tpu.atlas.evaluate import (render_atlas_texture,
                                              render_checkerboard)
    tex = render_atlas_texture(trainer.nets, params, 'fg', resolution=32)
    assert tex.shape == (32, 32, 3) and np.isfinite(tex).all()
    chk = render_checkerboard(trainer.nets, params, 16, 16, 4,
                              trainer.norm_s, trainer.norm_t, squares=4)
    assert chk.shape == (4, 16, 16, 3) and np.isfinite(chk).all()


def test_batched_step_matches_callable_losses(atlas_setup):
    """The trainer's batched loss (one apply per net over concatenated
    point sets, one hash-table scatter in the backward) must reproduce the
    callable-per-loss composition exactly — a literal restatement of the
    reference's loss assembly (train_atlas.py:164-249) via the public
    callable loss APIs."""
    trainer, params, _ = atlas_setup
    data = trainer.data
    rng = jax.random.PRNGKey(7)
    global_step = 3          # all pretrain-gated terms active
    batch = int(TRAIN_OPT['sample_batch_size'])

    # replicate the step's coordinate sampling
    kx, ky, kf = jax.random.split(rng, 3)
    x = jax.random.randint(kx, (batch,), 0, trainer.res_x)
    y = jax.random.randint(ky, (batch,), 0, trainer.res_y)
    f = jax.random.randint(kf, (batch,), 0, trainer.num_frames)
    xyf = jnp.stack([x, y, f], axis=-1)
    rgb_gt = data['video'][f, y, x]
    alpha_gt = data['mask'][f, y, x][:, None]
    dx_gt = data['dx'][f, y, x]
    dy_gt = data['dy'][f, y, x]

    nets = trainer.nets
    fg = lambda p: nets['FG_UV_Mapping'].apply(   # noqa: E731
        params['FG_UV_Mapping'], p)
    bg = lambda p: nets['BG_UV_Mapping'].apply(   # noqa: E731
        params['BG_UV_Mapping'], p)
    al = lambda p: nets['F_Alpha'].apply(params['F_Alpha'], p)  # noqa: E731
    at = lambda p: nets['F_Atlas'].apply(params['F_Atlas'], p)  # noqa: E731

    xyt = jnp.stack([trainer.norm_s(x), trainer.norm_s(y),
                     trainer.norm_t(f)], axis=-1).astype(jnp.float32)
    uv_fg, uv_bg = fg(xyt), bg(xyt)
    alpha = losses.scaled_alpha(al(xyt))
    rgb_out, rgb_fg, _ = losses.reconstruct_rgb(uv_fg, uv_bg, alpha, at)

    expected = {
        'gradient_loss': losses.gradient_loss(
            xyf, rgb_out, dx_gt, dy_gt, fg, bg, al, at,
            trainer.norm_s, trainer.norm_t),
        'rgb_loss': losses.rgb_loss(rgb_out, rgb_gt),
        'alpha_loss': losses.alpha_bce_loss(alpha, alpha_gt),
        'sparsity_loss': losses.sparsity_loss(rgb_fg, alpha),
        'flow_alpha_loss': losses.optical_flow_alpha_loss(
            xyf, alpha, al, data['flows'], data['flow_masks'],
            data['flows_rev'], data['flow_masks_rev'],
            trainer.norm_s, trainer.norm_t),
    }
    d_amt = TRAIN_OPT['derivative_amount']
    gd_amt = TRAIN_OPT['global_derivative_amount']
    for tag, mapper, uv, a in (('fg', fg, uv_fg, alpha),
                               ('bg', bg, uv_bg, 1 - alpha)):
        expected[f'rigidity_loss_{tag}'] = losses.rigidity_loss(
            xyf, uv, mapper, d_amt, trainer.larger_dim, trainer.uv_scale,
            trainer.norm_s, trainer.norm_t)
        expected[f'global_rigidity_loss_{tag}'] = losses.rigidity_loss(
            xyf, uv, mapper, gd_amt, trainer.larger_dim, trainer.uv_scale,
            trainer.norm_s, trainer.norm_t)
        expected[f'flow_loss_{tag}'] = losses.optical_flow_loss(
            xyf, uv, mapper, data['flows'], data['flow_masks'],
            data['flows_rev'], data['flow_masks_rev'], trainer.larger_dim,
            trainer.uv_scale, trainer.norm_s, trainer.norm_t, alpha=a)

    opt_state = trainer.init_opt_state(params)
    _, _, ld = trainer.step(params, opt_state, rng, global_step)
    for k, v in expected.items():
        np.testing.assert_allclose(
            np.asarray(ld[k]), np.asarray(v), rtol=1e-4, atol=1e-6,
            err_msg=f'batched step diverged from callable loss: {k}')
