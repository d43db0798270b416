"""Converter tests: key generation against known SD-1.5 torch keys, and
numerical parity of conversion conventions against torch primitives /
the transformers CLIPTextModel (torch CPU is available; diffusers is not)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from videoswap_tpu.models import AnimateDiffUNet3DModel, UNet3DConfig
from videoswap_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from videoswap_tpu.models.converters import (clip_key_map,
                                             convert_state_dict,
                                             convert_text_encoder,
                                             flax_path_to_torch_key)

TINY = UNet3DConfig(block_out_channels=(32, 64, 64, 64),
                    attention_head_dim=4, cross_attention_dim=32,
                    norm_num_groups=8, motion_heads=4)


def test_unet_key_generation():
    model = AnimateDiffUNet3DModel(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 4)),
                        jnp.array([0]), jnp.zeros((1, 7, 32)))
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params['params'])
    keys = {flax_path_to_torch_key(tuple(map(str, p))) for p in flat}
    # ground-truth key names from the SD-1.5 / AnimateDiff torch layout
    expected = [
        'conv_in.weight',
        'conv_in.bias',
        'time_embedding.linear_1.weight',
        'time_embedding.linear_2.bias',
        'down_blocks.0.resnets.0.norm1.weight',
        'down_blocks.0.resnets.0.time_emb_proj.weight',
        'down_blocks.0.resnets.1.conv2.bias',
        'down_blocks.0.attentions.0.norm.weight',
        'down_blocks.0.attentions.0.proj_in.weight',
        'down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight',
        'down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias',
        'down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight',
        'down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight',
        'down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight',
        'down_blocks.0.downsamplers.0.conv.weight',
        'down_blocks.1.resnets.0.conv_shortcut.weight',
        'down_blocks.0.motion_modules.0.temporal_transformer.proj_in.weight',
        'down_blocks.0.motion_modules.0.temporal_transformer.'
        'transformer_blocks.0.attention_blocks.1.to_v.weight',
        'down_blocks.0.motion_modules.0.temporal_transformer.'
        'transformer_blocks.0.norms.0.weight',
        'down_blocks.0.motion_modules.0.temporal_transformer.'
        'transformer_blocks.0.ff_norm.bias',
        'mid_block.resnets.1.norm2.bias',
        'mid_block.attentions.0.proj_out.weight',
        'up_blocks.1.upsamplers.0.conv.weight',
        'up_blocks.3.attentions.2.transformer_blocks.0.attn2.to_k.weight',
        'conv_norm_out.weight',
        'conv_out.bias',
    ]
    for k in expected:
        assert k in keys, f'missing generated key: {k}'


def test_dense_conv_orientation():
    """Converted torch Linear/Conv2d must produce identical outputs."""
    import flax.linen as nn

    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, img):
            return (nn.Dense(4, name='lin')(x),
                    nn.Conv(5, (3, 3), padding=1, name='conv')(img))

    m = M()
    x = np.random.RandomState(0).randn(2, 6).astype(np.float32)
    img = np.random.RandomState(1).randn(2, 8, 8, 3).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(img))
    sd = {'lin.weight': lin.weight, 'lin.bias': lin.bias,
          'conv.weight': conv.weight, 'conv.bias': conv.bias}
    params = {'params': convert_state_dict(sd, params['params'])[0]}
    out_lin, out_conv = m.apply(params, jnp.asarray(x), jnp.asarray(img))
    with torch.no_grad():
        ref_lin = lin(torch.from_numpy(x)).numpy()
        ref_conv = conv(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref_conv = ref_conv.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out_lin), ref_lin, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_conv), ref_conv, atol=1e-4)


def test_clip_text_parity_with_transformers():
    """Our flax CLIP text tower == transformers CLIPTextModel (random init,
    tiny config), weights moved across by the converter."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, hidden_act='quick_gelu')
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, max_position_embeddings=16,
                         intermediate_size=64)
    model = CLIPTextModel(cfg=cfg)
    ids = np.array([[3, 7, 1, 0, 42, 99, 5, 2]], dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    sd = {k: v for k, v in hf.state_dict().items()}
    params = {'params': convert_text_encoder(sd, params['params'])}
    out = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_clip_extra_token_embeds():
    cfg = CLIPTextConfig(vocab_size=50, hidden_size=32, num_layers=1,
                         num_heads=4, max_position_embeddings=8,
                         intermediate_size=64)
    model = CLIPTextModel(cfg=cfg)
    ids = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    extra = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    # ids >= vocab_size index into the extra table
    ids2 = jnp.asarray([[1, 50, 3, 53]], dtype=jnp.int32)
    out = model.apply(params, ids2, extra_token_embeds=extra)
    assert out.shape == (1, 4, 32)
    assert np.isfinite(np.asarray(out)).all()
