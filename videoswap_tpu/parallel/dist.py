"""Multi-host process scaffolding (SURVEY.md §5.8).

The reference's analogue is HF Accelerate DDP: `Accelerator(...)` process
init (reference train.py:29-31), `is_main_process` IO gating (:210,
logger.py:82) and `wait_for_everyone` barriers (:34, 187). TPU-native:

- `maybe_initialize_distributed()` calls `jax.distributed.initialize()`
  when multi-process execution is requested (flag or the standard TPU env
  vars) — after it, `jax.devices()` spans all hosts and GSPMD shards the
  same jitted programs over ICI/DCN from the mesh annotations alone;
- `is_main_process()` replaces `accelerator.is_main_process` for
  checkpoint/log/visualization IO;
- `barrier()` replaces `wait_for_everyone` (sync_global_devices).

Single-process runs are no-ops throughout, so the CLIs behave identically
on one chip.
"""

from __future__ import annotations

import os

import jax

_ENV_KEYS = ('COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS')


def distributed_requested(flag: bool = False) -> bool:
    return bool(flag or any(os.environ.get(k) for k in _ENV_KEYS))


def maybe_initialize_distributed(flag: bool = False) -> bool:
    """Initialize multi-process JAX when requested. Returns True if the
    process group is (now) initialized."""
    if not distributed_requested(flag):
        return False
    coord = (os.environ.get('JAX_COORDINATOR_ADDRESS')
             or os.environ.get('COORDINATOR_ADDRESS'))
    kwargs = {}
    if coord:
        kwargs['coordinator_address'] = coord
        if os.environ.get('NUM_PROCESSES'):
            kwargs['num_processes'] = int(os.environ['NUM_PROCESSES'])
        if os.environ.get('PROCESS_ID'):
            kwargs['process_id'] = int(os.environ['PROCESS_ID'])
    jax.distributed.initialize(**kwargs)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = 'barrier') -> None:
    """Cross-host sync (reference `accelerator.wait_for_everyone`)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
