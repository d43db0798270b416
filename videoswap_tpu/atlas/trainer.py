"""Layered-neural-atlas training: jitted 8-term-loss step + inverse step.

Parity: /root/reference/train_atlas.py:29-321. TPU-first differences:

- coordinates are sampled uniformly inside the jitted step via jax.random
  (the reference samples indices of an all-pixels table, get_tuples
  selects every pixel — identical distribution, no giant index tensor);
- the whole step (4 nets forward, 8 losses, Adam update) is ONE donated
  jit; the inverse-mapping regression is a second jitted step using the
  stop-gradiented FG mapping (train_atlas.py:256-266);
- UV-mapping pretraining (UV ~ scaled identity, unwrap_utils.py:115-138)
  is a scanned jitted loop;
- step-gated loss terms (alpha BCE until pretrain_alpha_iter, global
  rigidity until pretrain_global_rigidity_iter) use jnp.where gates so one
  compiled program covers all phases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from . import losses
from .imlp import IMLP


@dataclass
class AtlasTrainer:
    nets: dict                     # name -> IMLP module
    data: dict                     # arrays from load_input_data (device)
    train_opt: dict
    larger_dim: int
    num_frames: int
    # dp mesh (parallel.make_mesh((n, 1, 1))): points in a step batch are
    # iid, so the batch shards embarrassingly over 'dp' — one sharding
    # constraint on the sampled coordinates and GSPMD partitions the
    # gathers + MLP evals and psums the grads into the replicated params.
    # Reference parity: accelerate-prepared atlas nets/optimizer
    # (/root/reference/train_atlas.py:95-98, nominally DDP-capable).
    mesh: Any = None

    def __post_init__(self):
        lr = float(self.train_opt.get('optimizer', {}).get('lr', 1e-4))
        self.tx = optax.adam(lr)
        self.tx_inv = optax.adam(lr)
        self._step = None
        self._inv_step = None
        self._run_steps_cache = {}
        self.uv_scale = float(self.train_opt.get('uv_mapping_scale', 0.8))
        h, w = self.data['video'].shape[1:3]
        self.res_y, self.res_x = h, w
        # One (F, H, W, 16) array fuses every per-point data plane the
        # step reads, so the sampled batch needs ONE random gather instead
        # of eight: each 10k-row gather costs ~1.25 ms on v5e regardless
        # of payload width (random-access HBM latency-bound), so the 8
        # separate gathers were ~10 ms of the ~145 ms step
        # (scripts/bench_atlas_parts.py). Channel map:
        # [0:3] rgb  [3] mask  [4:7] dx  [7:10] dy  [10:12] flow_f
        # [12:14] flow_b  [14] flow_mask_f  [15] flow_mask_b
        d = self.data
        self._fused = jnp.concatenate([
            d['video'], d['mask'][..., None], d['dx'], d['dy'],
            d['flows'], d['flows_rev'], d['flow_masks'][..., None],
            d['flow_masks_rev'][..., None]], axis=-1)

    # normalization closures (reference train_atlas.py:102-103)
    def norm_s(self, v):
        return v / (self.larger_dim / 2.0) - 1.0

    def norm_t(self, v):
        return v / (self.num_frames / 2.0) - 1.0

    def _dp(self, *arrs):
        """dp-shard (batch,)-leading arrays over the point axis. No-op
        without a mesh; with one, the same rng stream makes the sharded
        step numerically identical to single-device (the reduction over
        points is GSPMD-psum'd instead of local)."""
        if self.mesh is None:
            return arrs if len(arrs) > 1 else arrs[0]
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape['dp']
        assert arrs[0].shape[0] % dp == 0, (
            f'sample_batch_size {arrs[0].shape[0]} must divide dp={dp}')
        s = NamedSharding(self.mesh, P('dp'))
        out = tuple(jax.lax.with_sharding_constraint(a, s) for a in arrs)
        return out if len(out) > 1 else out[0]

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    def init_params(self, rng) -> dict:
        keys = jax.random.split(rng, len(self.nets))
        params = {}
        for k, (name, net) in zip(keys, self.nets.items()):
            params[name] = jax.jit(net.init)(
                k, jnp.zeros((1, net.input_dim)))
        return self._replicate(params)

    def init_opt_state(self, params):
        main = {n: params[n] for n in
                ('FG_UV_Mapping', 'BG_UV_Mapping', 'F_Alpha', 'F_Atlas')}
        states = {'main': self.tx.init(main)}
        if 'FG_UV_Mapping_Inverse' in params:
            states['inverse'] = self.tx_inv.init(
                params['FG_UV_Mapping_Inverse'])
        return states

    # ------------------------------------------------------------- pretrain
    def pretrain_mapping(self, params, name: str, rng,
                         iters: int, batch: int = 10000):
        """UV ~ uv_mapping_scale * xy identity init."""
        net = self.nets[name]
        tx = optax.adam(1e-4)

        def body(carry, key):
            p, opt = carry
            kx, ky, kf = jax.random.split(key, 3)
            x = self.norm_s(jax.random.randint(kx, (batch,), 0, self.res_x))
            y = self.norm_s(jax.random.randint(ky, (batch,), 0, self.res_y))
            f = self.norm_t(jax.random.randint(kf, (batch,), 0,
                                               self.num_frames))
            x, y, f = self._dp(x, y, f)
            xyt = jnp.stack([x, y, f], axis=-1).astype(jnp.float32)

            def loss_fn(p):
                uv = net.apply(p, xyt)
                return losses.safe_norm(
                    xyt[:, :2] * self.uv_scale - uv).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, updates), opt), loss

        keys = jax.random.split(rng, iters * self.num_frames)
        (p, _), losses_hist = jax.jit(
            lambda p, keys: jax.lax.scan(body, (p, tx.init(p)), keys))(
                params[name], keys)
        params = dict(params, **{name: p})
        return params, float(losses_hist[-1])

    # ----------------------------------------------------------------- step
    def _step_fn(self):
        cfg = self.train_opt['loss_cfg']
        batch = int(self.train_opt.get('sample_batch_size', 10000))
        d_amt = int(self.train_opt.get('derivative_amount', 1))
        gd_amt = int(self.train_opt.get('global_derivative_amount', 100))
        pre_alpha = int(self.train_opt.get('pretrain_alpha_iter', 0))
        pre_grigid = int(self.train_opt.get(
            'pretrain_global_rigidity_iter', 0))
        w_rec = cfg['reconstruction_loss']
        nets = self.nets

        # `fused` is an ARGUMENT, not a closure capture: closed-over device
        # arrays are lowered as HLO constants, and at production scale
        # (768x448 x 72 frames ~ 1.6 GB) the serialized module breaks the
        # axon remote-compile transport (broken pipe). Passing the array
        # as a runtime parameter keeps the module small.
        def step(params, opt_state, rng, global_step, fused):
            kx, ky, kf = jax.random.split(rng, 3)
            x = jax.random.randint(kx, (batch,), 0, self.res_x)
            y = jax.random.randint(ky, (batch,), 0, self.res_y)
            f = jax.random.randint(kf, (batch,), 0, self.num_frames)
            x, y, f = self._dp(x, y, f)
            pt = fused[f, y, x]                    # ONE gather, 16 channels
            rgb_gt = pt[:, 0:3]
            alpha_gt = pt[:, 3:4]
            dx_gt = pt[:, 4:7]
            dy_gt = pt[:, 7:10]
            fl_f, fl_b = pt[:, 10:12], pt[:, 12:14]

            def loss_fn(main_params):
                # Batched evaluation: every net is applied ONCE over the
                # concatenation of all the point sets the losses need.
                # Measured perf-neutral on v5e (the scatter backward cost is
                # set by the total scattered-row count, which tcnn-parity
                # fixes regardless of how evals are grouped); kept for
                # structure and the batched-vs-callable parity test.
                fg = lambda p: nets['FG_UV_Mapping'].apply(   # noqa: E731
                    main_params['FG_UV_Mapping'], p)
                bg = lambda p: nets['BG_UV_Mapping'].apply(   # noqa: E731
                    main_params['BG_UV_Mapping'], p)
                al = lambda p: nets['F_Alpha'].apply(         # noqa: E731
                    main_params['F_Alpha'], p)
                at = lambda p: nets['F_Atlas'].apply(         # noqa: E731
                    main_params['F_Atlas'], p)

                def mk(px, py):
                    return jnp.stack(
                        [self.norm_s(px), self.norm_s(py), self.norm_t(f)],
                        axis=-1).astype(jnp.float32)

                n = x.shape[0]

                def match(fl, direction):
                    return jnp.stack(
                        [self.norm_s(x.astype(jnp.float32) + fl[:, 0]),
                         self.norm_s(y.astype(jnp.float32) + fl[:, 1]),
                         self.norm_t((f + direction).astype(jnp.float32))],
                        axis=-1)

                match_f = match(fl_f, 1)
                match_b = match(fl_b, -1)
                # order: main, x+1, y+1, x-d, y-d, x-gd, y-gd, flow_f, flow_b
                pts = [mk(x, y), mk(x + 1, y), mk(x, y + 1),
                       mk(x - d_amt, y), mk(x, y - d_amt),
                       mk(x - gd_amt, y), mk(x, y - gd_amt),
                       match_f, match_b]
                pts9 = jnp.concatenate(pts, axis=0)
                uv_fg9 = fg(pts9)
                uv_bg9 = bg(pts9)
                s = lambda arr, i: arr[i * n:(i + 1) * n]   # noqa: E731
                # F_Alpha is needed at main, x+1, y+1 and the flow matches.
                al5 = losses.scaled_alpha(al(jnp.concatenate(
                    [pts[0], pts[1], pts[2], match_f, match_b], axis=0)))
                alpha = s(al5, 0)
                # F_Atlas at the six (uv, layer) sites the reconstructions
                # need: quadrant shift applied per slice BEFORE the concat
                # (atlas_rgb: fg -> +0.5, bg -> -0.5).
                at6 = (at(jnp.concatenate(
                    [s(uv_fg9, 0) * 0.5 + 0.5, s(uv_bg9, 0) * 0.5 - 0.5,
                     s(uv_fg9, 1) * 0.5 + 0.5, s(uv_bg9, 1) * 0.5 - 0.5,
                     s(uv_fg9, 2) * 0.5 + 0.5, s(uv_bg9, 2) * 0.5 - 0.5],
                    axis=0)) + 1.0) * 0.5
                rgb_fg = s(at6, 0)

                def recon(i, a):
                    return (s(at6, 2 * i) * a
                            + s(at6, 2 * i + 1) * (1.0 - a))

                rgb_out = recon(0, alpha)
                uv_fg, uv_bg = s(uv_fg9, 0), s(uv_bg9, 0)

                ld = {}
                total = 0.0
                ld['gradient_loss'] = losses.gradient_loss_pre(
                    rgb_out, recon(1, s(al5, 1)), recon(2, s(al5, 2)),
                    dx_gt, dy_gt)
                total += w_rec['gradient_loss_weight'] * ld['gradient_loss']

                ld['rgb_loss'] = losses.rgb_loss(rgb_out, rgb_gt)
                total += w_rec['rgb_loss_weight'] * ld['rgb_loss']

                ld['alpha_loss'] = losses.alpha_bce_loss(alpha, alpha_gt)
                total += jnp.where(
                    global_step <= pre_alpha,
                    w_rec['alpha_loss_weight'] * ld['alpha_loss'], 0.0)

                ld['sparsity_loss'] = losses.sparsity_loss(rgb_fg, alpha)
                total += (cfg['sparsity_loss']['sparsity_loss_weight']
                          * ld['sparsity_loss'])

                for tag, uv9, uv in (('fg', uv_fg9, uv_fg),
                                     ('bg', uv_bg9, uv_bg)):
                    r = losses.rigidity_loss_pre(
                        uv, s(uv9, 3), s(uv9, 4), d_amt,
                        self.larger_dim, self.uv_scale)
                    ld[f'rigidity_loss_{tag}'] = r
                    total += cfg['rigidity_loss']['rigidity_loss_weight'] * r
                    g = losses.rigidity_loss_pre(
                        uv, s(uv9, 5), s(uv9, 6), gd_amt,
                        self.larger_dim, self.uv_scale)
                    ld[f'global_rigidity_loss_{tag}'] = g
                    total += jnp.where(
                        global_step <= pre_grigid,
                        cfg['rigidity_loss']
                        [f'global_rigidity_{tag}_loss_weight'] * g, 0.0)

                valid_f = pt[:, 14]
                valid_b = pt[:, 15]
                for tag, uv9, uv, a in (
                        ('fg', uv_fg9, uv_fg, alpha),
                        ('bg', uv_bg9, uv_bg, 1 - alpha)):
                    fl = losses.optical_flow_loss_pre(
                        uv, s(uv9, 7), s(uv9, 8), valid_f, valid_b,
                        self.larger_dim, self.uv_scale, alpha=a)
                    ld[f'flow_loss_{tag}'] = fl
                    total += cfg['flow_loss']['flow_loss_weight'] * fl

                fa = losses.optical_flow_alpha_loss_pre(
                    alpha, s(al5, 3), s(al5, 4), valid_f, valid_b)
                ld['flow_alpha_loss'] = fa
                total += cfg['flow_loss']['alpha_flow_loss_weight'] * fa

                ld['total_loss'] = total
                return total, ld

            main = {n: params[n] for n in
                    ('FG_UV_Mapping', 'BG_UV_Mapping', 'F_Alpha', 'F_Atlas')}
            (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(main)
            updates, new_opt = self.tx.update(grads, opt_state['main'], main)
            main = optax.apply_updates(main, updates)
            new_params = dict(params, **main)
            return new_params, dict(opt_state, main=new_opt), ld

        return step

    def step(self, params, opt_state, rng, global_step):
        if self._step is None:
            self._step = jax.jit(self._step_fn(), donate_argnums=(0, 1))
        return self._step(params, opt_state, rng,
                          jnp.asarray(global_step), self._fused)

    # -------------------------------------------------------- inverse step
    def _inv_step_fn(self):
        batch = int(self.train_opt.get('sample_batch_size', 10000))
        nets = self.nets

        def step(inv_params, fg_params, opt_state, rng, mask):
            kx, ky, kf = jax.random.split(rng, 3)
            x = jax.random.randint(kx, (batch,), 0, self.res_x)
            y = jax.random.randint(ky, (batch,), 0, self.res_y)
            f = jax.random.randint(kf, (batch,), 0, self.num_frames)
            x, y, f = self._dp(x, y, f)
            xyt = jnp.stack([self.norm_s(x), self.norm_s(y),
                             self.norm_t(f)], axis=-1).astype(jnp.float32)
            fg_mask = mask[f, y, x]  # supervise FG points only
            uv = jax.lax.stop_gradient(
                nets['FG_UV_Mapping'].apply(fg_params, xyt))
            uvt = jnp.concatenate([uv, xyt[:, 2:]], axis=-1)

            def loss_fn(p):
                pred = nets['FG_UV_Mapping_Inverse'].apply(p, uvt)
                err = losses.safe_norm(pred - xyt)
                return losses.masked_mean(err, fg_mask == 1)

            loss, grads = jax.value_and_grad(loss_fn)(inv_params)
            updates, new_opt = self.tx_inv.update(grads, opt_state['inverse'],
                                                  inv_params)
            inv_params = optax.apply_updates(inv_params, updates)
            return inv_params, dict(opt_state, inverse=new_opt), loss

        return step

    def inverse_step(self, params, opt_state, rng):
        if self._inv_step is None:
            self._inv_step = jax.jit(self._inv_step_fn(),
                                     donate_argnums=(0,))
        inv, opt_state, loss = self._inv_step(
            params['FG_UV_Mapping_Inverse'], params['FG_UV_Mapping'],
            opt_state, rng, self.data['mask'])
        return dict(params, FG_UV_Mapping_Inverse=inv), opt_state, loss

    # -------------------------------------------------- scanned multi-step
    def _build_run_steps(self, n: int, with_inverse: bool):
        main_step = self._step_fn()
        inv_step = self._inv_step_fn() if with_inverse else None

        def run(params, opt_state, rng, start_step, fused, mask):
            def body(carry, it):
                params, opt_state = carry
                key, gstep = it
                k1, k2 = jax.random.split(key)
                params, opt_state, ld = main_step(params, opt_state, k1,
                                                  gstep, fused)
                if inv_step is not None:
                    inv, opt_state, inv_loss = inv_step(
                        params['FG_UV_Mapping_Inverse'],
                        params['FG_UV_Mapping'], opt_state, k2,
                        mask)
                    params = dict(params, FG_UV_Mapping_Inverse=inv)
                    ld = dict(ld, fg_inv_loss=inv_loss)
                return (params, opt_state), ld

            keys = jax.random.split(rng, n)
            gsteps = start_step + jnp.arange(1, n + 1)
            (params, opt_state), lds = jax.lax.scan(
                body, (params, opt_state), (keys, gsteps))
            # report the LAST iteration's losses (what the host loop logs)
            return params, opt_state, jax.tree.map(lambda a: a[-1], lds)

        return jax.jit(run, donate_argnums=(0, 1))

    def run_steps(self, params, opt_state, rng, start_step: int, n: int):
        """Run iterations start_step+1 .. start_step+n as ONE device
        dispatch (`lax.scan` over the fused main+inverse step).

        The atlas step is a 10k-point MLP batch — small enough that the
        per-dispatch overhead of a remote host loop (~4-5 ms on the axon
        tunnel) dominates the compute. Scanning a whole log interval per
        dispatch removes that; the driver chunks at print/val/save
        boundaries. RNG per iteration is split from one carried key, so
        the loss trajectory is statistically (not bit-) identical to the
        single-step path."""
        with_inv = 'FG_UV_Mapping_Inverse' in params
        key = (int(n), with_inv)
        fn = self._run_steps_cache.get(key)
        if fn is None:
            fn = self._run_steps_cache[key] = self._build_run_steps(
                int(n), with_inv)
        return fn(params, opt_state, rng, jnp.asarray(start_step),
                  self._fused, self.data['mask'])
