"""Experiment directories, logging, and iteration messages.

Parity: /root/reference/videoswap/utils/logger.py — timestamped archive-
rename of existing experiment dirs (:19-29), config copy with a command-line
header (:48-62), `experiments/<name>` for training vs `results/<name>` for
testing (:65-94), `[name][Iter: ..][lr, eta] losses` message format
(:136-195). Multi-process loss reduction becomes a `jax.process_index()`
guard + already-reduced device values (no accelerate).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from datetime import datetime


def get_time_str() -> str:
    return datetime.now().strftime('%Y%m%d_%H%M%S')


def mkdir_and_rename(path: str) -> None:
    """mkdir; when it exists, archive-rename the old one with a timestamp."""
    if os.path.exists(path):
        os.rename(path, path + '_archived_' + get_time_str())
    os.makedirs(path, exist_ok=True)


def copy_opt_file(opt_path: str, experiments_root: str) -> None:
    import yaml
    os.makedirs(experiments_root, exist_ok=True)
    with open(opt_path, 'r') as f:
        content = f.read()
    header = (f'# GENERATE TIME: {time.asctime()}\n'
              f'# CMD: {" ".join(sys.argv)}\n\n')
    out = os.path.join(experiments_root, os.path.basename(opt_path))
    with open(out, 'w') as f:
        f.write(header + content)
    _ = yaml  # parity with reference (yaml validated at load time)


def set_path_logger(root_path: str, config_path: str, opt: dict,
                    is_train: bool = True,
                    reuse_existing: bool = False) -> dict:
    """Create the experiment directory tree and record paths in opt.

    `reuse_existing` (train.py --resume) keeps an existing experiment dir
    in place instead of archive-renaming it — otherwise the rename would
    sweep away the very train_state/orbax checkpoints resume needs.

    Multi-host: only process 0 touches the filesystem (the reference gates
    on accelerator.is_main_process, logger.py:82 / train.py:210); other
    processes get the same paths + a stream-only logger."""
    from videoswap_tpu.parallel.dist import barrier, is_main_process
    name = opt['name']
    base = 'experiments' if is_train else 'results'
    exp_root = os.path.join(root_path, base, name)
    main = is_main_process()
    if main:
        if reuse_existing:
            os.makedirs(exp_root, exist_ok=True)
        else:
            mkdir_and_rename(exp_root)
    paths = {
        'exp_root': exp_root,
        'models': os.path.join(exp_root, 'models'),
        'visualization': os.path.join(exp_root, 'visualization'),
        'log': os.path.join(exp_root, f'{"train" if is_train else "test"}_'
                            f'{name}_{get_time_str()}.log'),
    }
    if main:
        for k in ('models', 'visualization'):
            os.makedirs(paths[k], exist_ok=True)
        copy_opt_file(config_path, exp_root)
    opt.setdefault('path', {}).update(paths)
    init_logger(paths['log'] if main else None)
    barrier('set_path_logger')
    return paths


def init_logger(log_file: str | None = None,
                name: str = 'videoswap_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter('%(asctime)s %(levelname)s: %(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file, 'w')
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_logger() -> logging.Logger:
    return init_logger()


def dict2str(opt: dict, indent_level: int = 1) -> str:
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg


class MessageLogger:
    """Formats `[name][Iter: n/N, lr] [eta, time] loss:` lines."""

    def __init__(self, opt: dict, start_iter: int = 0):
        self.exp_name = opt['name']
        self.total_iter = opt['train']['total_iter']
        self.start_iter = start_iter
        self.logger = get_logger()
        self.start_time = time.time()

    def __call__(self, log_vars: dict) -> None:
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs', [])
        msg = (f'[{self.exp_name[:30]}..][Iter:{current_iter:8,d}/'
               f'{self.total_iter}, lr:(' +
               ', '.join(f'{lr:.3e}' for lr in lrs) + ')] ')
        total_time = time.time() - self.start_time
        done = max(current_iter - self.start_iter, 1)
        time_sec_avg = total_time / done
        eta = time_sec_avg * (self.total_iter - current_iter)
        msg += f'[eta: {int(eta // 3600)}:{int(eta % 3600 // 60):02d}:' \
               f'{int(eta % 60):02d}, time (avg): {time_sec_avg:.3f}] '
        for k, v in log_vars.items():
            msg += f'{k}: {float(v):.4e} '
        self.logger.info(msg)


def reduce_loss_dict(loss_dict: dict) -> dict:
    """Cross-process loss averaging (reference logger.py:198-224 used
    accelerate.reduce over NCCL). Under pjit/GSPMD a jitted loss is already
    a GLOBAL value on every process (the mean runs inside the compiled
    program, reduced over ICI/DCN by XLA), so this only fetches host
    floats; log on jax.process_index() == 0."""
    import jax
    return {k: float(jax.device_get(v)) for k, v in loss_dict.items()}
