"""Layered-neural-atlas training driver:
`python train_atlas.py -opt options/train_atlas/x.yml`.

Parity: /root/reference/train_atlas.py — same YAML schema (models/datasets/
train/val/logger blocks), UV pretraining, 8-term loss, separate inverse-
mapping optimizer, PSNR validation, inverse round-trip check, point-
annotation propagation validation.
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.atlas.data import load_input_data
from videoswap_tpu.atlas.evaluate import evaluate_model
from videoswap_tpu.atlas.imlp import imlp_from_opt
from videoswap_tpu.atlas.trainer import AtlasTrainer
from videoswap_tpu.utils.config import load_config
from videoswap_tpu.utils.logger import (MessageLogger, dict2str, get_logger,
                                        set_path_logger)

NET_NAMES = ('FG_UV_Mapping', 'BG_UV_Mapping', 'F_Alpha', 'F_Atlas',
             'FG_UV_Mapping_Inverse')


def build_nets(models_opt: dict) -> dict:
    return {name: imlp_from_opt(models_opt[name])
            for name in NET_NAMES if name in models_opt}


def save_atlas_checkpoint(path: str, params: dict) -> None:
    from flax import serialization
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as fh:
        fh.write(serialization.to_bytes(params))


def load_atlas_checkpoint(path: str, template: dict) -> dict:
    if path.endswith('.pth'):
        from videoswap_tpu.models.converters import (convert_state_dict,
                                                     load_torch_file)
        sd = load_torch_file(path)
        out = {}
        for name, tpl in template.items():
            sub = {k[len(name) + 1:]: v for k, v in sd.items()
                   if k.startswith(name + '.')}
            if name in sd and isinstance(sd[name], dict):
                sub = sd[name]
            out[name] = {'params': convert_state_dict(
                sub, tpl['params'], strict=False)[0]}
        return out
    from flax import serialization
    with open(path, 'rb') as fh:
        return serialization.from_bytes(template, fh.read())


def train(root_path: str, args) -> None:
    opt = load_config(args.opt)
    set_path_logger(root_path, args.opt, opt, is_train=True)
    logger = get_logger()
    logger.info(dict2str(opt))

    seed = opt.get('manual_seed') or random.randint(1, 10000)
    rng = jax.random.PRNGKey(seed)

    nets = build_nets(opt['models'])
    for n, net in nets.items():
        logger.info(f'{n}: pe={net.pe_type} layers={net.mlp_layers} '
                    f'hidden={net.hidden_dim}')

    data_np = load_input_data(opt['datasets'])
    data = {k: jnp.asarray(v) for k, v in data_np.items()}
    num_frames = data_np['video'].shape[0]
    larger_dim = int(max(data_np['video'].shape[1:3]))

    # the reference keeps sample_batch_size under datasets; accept both
    if 'sample_batch_size' in opt['datasets']:
        opt['train'].setdefault('sample_batch_size',
                                opt['datasets']['sample_batch_size'])

    mesh = None
    if getattr(args, 'shard', None):
        # dp over the point batch (points are iid): one sharding
        # constraint inside the step, GSPMD psums the grads. Same rng
        # stream -> numerically identical to the single-device run
        # (tests/test_atlas.py::test_atlas_sharded_step_matches).
        from videoswap_tpu.parallel import make_mesh
        n = int(args.shard)
        mesh = make_mesh((n, 1, 1))
        from jax.sharding import NamedSharding, PartitionSpec
        data = {k: jax.device_put(v, NamedSharding(mesh, PartitionSpec()))
                for k, v in data.items()}
        logger.info(f'atlas training dp-sharded over {n} devices')

    trainer = AtlasTrainer(nets=nets, data=data, train_opt=opt['train'],
                           larger_dim=larger_dim, num_frames=num_frames,
                           mesh=mesh)

    rng, init_rng = jax.random.split(rng)
    params = trainer.init_params(init_rng)
    opt_state = trainer.init_opt_state(params)

    pre_iters = int(opt['train'].get('pretrain_UV_mapping_iter', 0))
    if pre_iters > 0:
        for name in ('FG_UV_Mapping', 'BG_UV_Mapping'):
            rng, k = jax.random.split(rng)
            params, loss = trainer.pretrain_mapping(params, name, k,
                                                    pre_iters)
            logger.info(f'pretrained {name}, final loss {loss:.4f}')
        # re-init the main optimizer after pretraining moved the params
        opt_state = trainer.init_opt_state(params)

    total_iter = int(opt['train']['total_iter'])
    print_freq = int(opt['logger'].get('print_freq', 100))
    save_freq = int(float(opt['logger'].get('save_checkpoint_freq', 10000)))
    val_freq = int(opt.get('val', {}).get('val_freq', 10 ** 9))
    msg = MessageLogger(opt, 0)
    lr = float(opt['train'].get('optimizer', {}).get('lr', 1e-4))

    # One device dispatch per log interval: the 10k-point step is tiny, so
    # a per-iteration host loop pays ~4-5 ms dispatch overhead per step on
    # the axon tunnel (more than the compute). run_steps scans to the next
    # print/val/save boundary; boundary spacing is usually one distinct
    # chunk size, so at most a couple of scan programs compile.
    global_step = 0
    while global_step < total_iter:
        nxt = min(f * (global_step // f + 1)
                  for f in (print_freq, save_freq, val_freq)
                  if f < 10 ** 9)
        nxt = min(nxt, total_iter)
        rng, k = jax.random.split(rng)
        params, opt_state, loss_dict = trainer.run_steps(
            params, opt_state, k, global_step, nxt - global_step)
        global_step = nxt

        if global_step % print_freq == 0:
            log_vars = {'iter': global_step, 'lrs': [lr]}
            log_vars.update(jax.device_get(loss_dict))
            msg(log_vars)

        if global_step % val_freq == 0:
            save_dir = os.path.join(opt['path']['visualization'],
                                    f'Iter_{global_step}')
            val = evaluate_model(
                nets, params, data_np['video'],
                opt['datasets']['res_x'], opt['datasets']['res_y'],
                num_frames, trainer.norm_s, trainer.norm_t,
                save_dir=save_dir, data=data_np,
                full=bool(opt.get('val', {}).get('full_eval', False)),
                uv_mapping_scale=trainer.uv_scale,
                derivative_amount=int(opt['train'].get(
                    'derivative_amount', 1)))
            logger.info(f'Validation Reconstruction PSNR: {val:.4f}')

            if 'FG_UV_Mapping_Inverse' in params:
                from videoswap_tpu.atlas.propagate import bind_nets
                fg, inv, _ = bind_nets(nets, params)
                pt = jnp.asarray([[trainer.norm_s(trainer.res_x / 2.0),
                                   trainer.norm_s(trainer.res_y / 2.0),
                                   trainer.norm_t(num_frames // 2)]])
                roundtrip = inv(jnp.concatenate(
                    [fg(pt), pt[:, 2:]], axis=-1))
                logger.info(f'inverse pred: {np.asarray(roundtrip)}, '
                            f'gt: {np.asarray(pt)}')

        if global_step % save_freq == 0 or global_step == total_iter:
            path = os.path.join(opt['path']['models'],
                                f'models_{global_step}.msgpack')
            save_atlas_checkpoint(path, params)
            logger.info(f'Save models to {path}')


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True)
    parser.add_argument('--shard', type=int, default=None,
                        help='dp-shard the point batch over N devices')
    args = parser.parse_args()
    train(os.path.abspath('.'), args)
