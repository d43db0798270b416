"""Sharding rules: params over tp, activations over (dp, sp).

Megatron-style tensor parallelism expressed as param shardings — GSPMD then
inserts the matching all-reduces:

- attention to_q/to_k/to_v and FFN net_0_proj kernels: split the OUTPUT
  feature axis over `tp` (column parallel);
- attention to_out_0 and FFN net_2 kernels: split the INPUT axis over `tp`
  (row parallel, all-reduce after);
- everything else (convs, norms, embeddings, time MLP) replicated — conv
  channel counts (320..1280) make head/FFN matmuls the only tp-worthy ops
  in this model family.

Batch/video tensors shard (B, F, ...) over (dp, sp).
"""

from __future__ import annotations

import jax
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

_COL_PARALLEL = ('to_q', 'to_k', 'to_v', 'net_0_proj', 'q_proj', 'k_proj',
                 'v_proj', 'mlp_fc1')
_ROW_PARALLEL = ('to_out_0', 'net_2', 'out_proj', 'mlp_fc2')


def param_sharding_rules(path: tuple[str, ...], leaf) -> P:
    names = set(path)
    if leaf.ndim == 2:
        if names & set(_COL_PARALLEL):
            return P(None, 'tp')
        if names & set(_ROW_PARALLEL):
            return P('tp', None)
    return P()


def shard_params(params, mesh):
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = param_sharding_rules(tuple(str(p) for p in path), leaf)
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def replicate_tree(tree, mesh):
    """device_put every leaf replicated over `mesh` (committed, so donated
    jit steps keep the buffers on all devices)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def batch_sharding(mesh, ndim: int, frame_axis: int = 1) -> NamedSharding:
    """(B, F, ...) tensors: B over dp, F over sp."""
    spec = ['dp'] + [None] * (ndim - 1)
    spec[frame_axis] = 'sp'
    return NamedSharding(mesh, P(*spec))


def video_sharding(mesh, shape, frame_axis: int = 1) -> NamedSharding:
    """batch_sharding that degrades gracefully: an axis only shards when
    its extent divides the mesh axis (B=1 with dp>1 stays replicated
    instead of erroring) — the safe variant for CLI-provided shapes."""
    spec = [None] * len(shape)
    if shape[0] % mesh.shape['dp'] == 0:
        spec[0] = 'dp'
    if shape[frame_axis] % mesh.shape['sp'] == 0:
        spec[frame_axis] = 'sp'
    return NamedSharding(mesh, P(*spec))


def constrain_frames(x, frame_axis: int = 1):
    """Pin a (B, F, ...) activation to (dp, sp) batch/frame sharding when a
    mesh with those axes is ambient; identity otherwise (single-chip, or
    off-mesh tests).

    Why: the spatial transformers fold frames into batch ((B,F,H,W,C) ->
    (B*F,HW,C)); when CFG doubles B to 2 with sp=2, GSPMD's propagation of
    the merged-axis sharding back through the unfold is ambiguous and it
    alternates between batch-sharded and frame-sharded layouts from block
    to block, paying an involuntary replicate-and-repartition (observed:
    144 collective-permutes per CFG U-Net step on a (1,2,4) mesh; its
    spmd_partitioner warnings name exactly these reshapes). Re-stating the
    canonical layout at block boundaries removes the ambiguity."""
    import os
    if os.environ.get('VS_NO_FRAME_CONSTRAIN'):    # A/B escape hatch
        return x
    am = jax.sharding.get_abstract_mesh()
    if am.empty or 'sp' not in am.axis_names:
        return x
    sizes = dict(am.shape)
    dp, sp = sizes.get('dp', 1), sizes['sp']
    spec = [None] * x.ndim
    b = x.shape[0]
    if b > 1 and b % (dp * sp) == 0:
        # CFG doubles the batch: shard the HALVES over (dp, sp) — each
        # device group computes one half entirely locally (frame-sharding
        # cannot survive the (B,F)->(B*F) fold contiguously when B>1, so
        # GSPMD would otherwise replicate-and-repartition at every fold)
        spec[0] = ('dp', 'sp') if dp > 1 else 'sp'
    else:
        if dp > 1 and b % dp == 0:
            spec[0] = 'dp'
        if x.shape[frame_axis] % sp == 0:
            spec[frame_axis] = 'sp'
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_batch(batch: dict, mesh) -> dict:
    """Shard the trainer batch dict onto the mesh."""
    out = {}
    for k, v in batch.items():
        if k == 'pixels':                       # (B, F, H, W, 3)
            s = batch_sharding(mesh, v.ndim)
        elif k == 'pred_tracks':                # (F, P, 2) frame axis 0
            s = NamedSharding(mesh, P('sp'))
        else:                                   # ids, embeddings: replicate
            s = NamedSharding(mesh, P())
        out[k] = jax.device_put(v, s)
    return out


def shard_pipeline(pipe, mesh):
    """One-liner sharded inference: returns a NEW VideoSwapPipeline whose
    U-Net params are Megatron tp-sharded, whose VAE/text-encoder/adapter
    params are replicated over `mesh`, and whose `mesh` field is set so the
    pipeline dp/sp-shards source pixels and sampling latents itself
    (video_sharding). The analogue of the reference's accelerate-prepared
    inference (reference train.py:135, test.py:28)."""
    import dataclasses

    sharded = {}
    for name, tree in pipe.params.items():
        if name == 'unet':
            sharded[name] = shard_params(tree, mesh)
        else:
            sharded[name] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
    if dataclasses.is_dataclass(pipe):
        return dataclasses.replace(pipe, params=sharded, mesh=mesh)
    import copy
    clone = copy.copy(pipe)
    clone.params = sharded
    clone.mesh = mesh
    return clone
