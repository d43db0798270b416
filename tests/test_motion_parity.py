"""VanillaTemporalModule == a literal torch restatement of the reference
AnimateDiff motion module (motion_module.py:48-340).

This is the regression test for the per-frame-GroupNorm semantics: the
reference normalizes '(b f) c h w' (motion_module.py:112 after the :286
rearrange), so statistics must not mix frames — a cross-frame GN passes
every shape test but diverges numerically for F > 1."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from videoswap_tpu.models.motion_module import VanillaTemporalModule


def torch_motion_module(x5, p, heads, groups, max_len=24):
    """Literal reference restatement. x5: (B, F, H, W, C) numpy;
    p: our flax param tree['temporal_transformer'] (kernels transposed)."""
    t = {k: torch.tensor(np.asarray(v)) for k, v in {
        'gn_w': p['norm']['scale'], 'gn_b': p['norm']['bias'],
        'in_w': p['proj_in']['kernel'], 'in_b': p['proj_in']['bias'],
        'out_w': p['proj_out']['kernel'], 'out_b': p['proj_out']['bias'],
    }.items()}
    blk = p['transformer_blocks_0']
    b, f, hh, ww, c = x5.shape
    x = torch.tensor(np.asarray(x5)).permute(0, 4, 1, 2, 3)  # b c f h w

    # TemporalTransformer3DModel.forward (motion_module.py:139-180)
    video_length = x.shape[2]
    h = x.reshape(b, c, f, hh * ww).permute(0, 2, 3, 1) \
         .reshape(b * f, hh, ww, c).permute(0, 3, 1, 2)       # (b f) c h w
    residual = h
    h = F.group_norm(h, groups, t['gn_w'], t['gn_b'], eps=1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b * f, hh * ww, c)
    h = h @ t['in_w'] + t['in_b']                             # Linear

    # TemporalTransformerBlock (2x Temporal_Self attention + FFN)
    pos = torch.arange(max_len).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, c, 2).float()
                    * (-math.log(10000.0) / c))
    pe = torch.zeros(1, max_len, c)
    pe[0, :, 0::2] = torch.sin(pos * div)
    pe[0, :, 1::2] = torch.cos(pos * div)

    d = hh * ww
    for j in (0, 1):
        a = blk[f'attention_blocks_{j}']
        ln_w = torch.tensor(np.asarray(blk[f'norms_{j}']['scale']))
        ln_b = torch.tensor(np.asarray(blk[f'norms_{j}']['bias']))
        hn = F.layer_norm(h, (c,), ln_w, ln_b, eps=1e-6)
        # VanillaAttentionProcessor (motion_module.py:286-338)
        hs = hn.reshape(b * f, d, c).reshape(b, f, d, c) \
               .permute(0, 2, 1, 3).reshape(b * d, f, c)      # (b d) f c
        hs = hs + pe[:, :f]
        wq = torch.tensor(np.asarray(a['to_q']['kernel']))
        wk = torch.tensor(np.asarray(a['to_k']['kernel']))
        wv = torch.tensor(np.asarray(a['to_v']['kernel']))
        wo = torch.tensor(np.asarray(a['to_out_0']['kernel']))
        bo = torch.tensor(np.asarray(a['to_out_0']['bias']))
        q, k, v = hs @ wq, hs @ wk, hs @ wv
        dh = c // heads
        def split(z):
            return z.reshape(b * d, f, heads, dh).permute(0, 2, 1, 3) \
                    .reshape(b * d * heads, f, dh)
        q, k, v = split(q), split(k), split(v)
        probs = torch.softmax(q @ k.transpose(1, 2) * dh ** -0.5, dim=-1)
        o = probs @ v
        o = o.reshape(b * d, heads, f, dh).permute(0, 2, 1, 3) \
             .reshape(b * d, f, c)
        o = o @ wo + bo
        o = o.reshape(b, d, f, c).permute(0, 2, 1, 3).reshape(b * f, d, c)
        h = o + h

    fn_w = torch.tensor(np.asarray(blk['ff_norm']['scale']))
    fn_b = torch.tensor(np.asarray(blk['ff_norm']['bias']))
    w1 = torch.tensor(np.asarray(blk['ff']['net_0_proj']['kernel']))
    b1 = torch.tensor(np.asarray(blk['ff']['net_0_proj']['bias']))
    w2 = torch.tensor(np.asarray(blk['ff']['net_2']['kernel']))
    b2 = torch.tensor(np.asarray(blk['ff']['net_2']['bias']))
    hn = F.layer_norm(h, (c,), fn_w, fn_b, eps=1e-6)
    ff = hn @ w1 + b1
    aa, gate = ff.chunk(2, dim=-1)
    h = (aa * F.gelu(gate)) @ w2 + b2 + h

    h = h @ t['out_w'] + t['out_b']
    h = h.permute(0, 2, 1).reshape(b * f, c, hh, ww) + residual
    h = h.reshape(b, f, c, hh, ww).permute(0, 1, 3, 4, 2)     # b f h w c
    return h.numpy()


def test_motion_module_matches_torch_reference():
    b, f, hw, c, heads, groups = 2, 4, 4, 32, 4, 8
    mm = VanillaTemporalModule(heads=heads, num_transformer_block=1,
                               norm_groups=groups)
    rs = np.random.RandomState(0)
    x = rs.randn(b, f, hw, hw, c).astype(np.float32) * 0.5
    params = mm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # perturb away from the zero proj_out init so the body is exercised
    params = jax.tree.map(lambda p: p + np.float32(0.01), params)

    ours = np.asarray(mm.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = torch_motion_module(
            x, params['params']['temporal_transformer'], heads, groups)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
