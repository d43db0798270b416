"""CLIP vision tower + full-CLIP scorer parity vs transformers
(config-built random weights, offline — same pattern as the text-tower
parity test in test_converters.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from videoswap_tpu.models.clip_text import CLIPTextConfig
from videoswap_tpu.models.clip_vision import (CLIPVisionConfig,
                                              CLIPVisionModel,
                                              CLIPWithProjection,
                                              preprocess_frames)
from videoswap_tpu.models.converters import (convert_clip_full,
                                             convert_clip_vision)

TINY_VISION = dict(image_size=28, patch_size=14, hidden_size=32,
                   intermediate_size=64, num_attention_heads=4,
                   num_hidden_layers=2, hidden_act='quick_gelu')


def test_clip_vision_parity_with_transformers():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel as HFModel

    torch.manual_seed(0)
    hf = HFModel(HFConfig(**TINY_VISION)).eval()

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=64)
    model = CLIPVisionModel(cfg=cfg)
    img = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = {'params': convert_clip_vision(hf.state_dict(),
                                            params['params'])}
    hidden, pooled = model.apply(params, jnp.asarray(img))
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(hidden),
                               ref.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), atol=2e-5)


def test_clip_score_parity_with_transformers():
    from transformers import CLIPConfig, CLIPModel
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPVisionConfig as HFVisionConfig

    # eos_token_id must be the highest vocab id, like the real CLIP
    # (49407): transformers pools at the first EOS occurrence, our flax
    # tower at argmax(ids) — identical when EOS is the max id present
    # (real tokenizer output is EOS-padded).
    hf_cfg = CLIPConfig.from_text_vision_configs(
        HFTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=16, hidden_act='quick_gelu',
                     eos_token_id=99),
        HFVisionConfig(**TINY_VISION), projection_dim=16)
    torch.manual_seed(1)
    hf = CLIPModel(hf_cfg).eval()

    model = CLIPWithProjection(
        vision_cfg=CLIPVisionConfig(image_size=28, patch_size=14,
                                    hidden_size=32, num_layers=2,
                                    num_heads=4, intermediate_size=64,
                                    projection_dim=16),
        text_cfg=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                num_layers=2, num_heads=4,
                                max_position_embeddings=16,
                                intermediate_size=64))
    img = np.random.RandomState(1).rand(2, 28, 28, 3).astype(np.float32)
    ids = np.array([[3, 7, 99, 0, 42, 1, 5, 2],
                    [9, 99, 1, 1, 1, 1, 1, 1]], dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                        jnp.asarray(ids))
    params = {'params': convert_clip_full(hf.state_dict(),
                                          params['params'])}
    score = model.apply(params, jnp.asarray(img), jnp.asarray(ids))

    with torch.no_grad():
        ie = hf.get_image_features(torch.from_numpy(img).permute(0, 3, 1, 2))
        te = hf.get_text_features(torch.from_numpy(ids.astype(np.int64)))
        cos = torch.nn.functional.cosine_similarity(ie, te)
        ref = (cos.clamp(min=0) * 100.0).numpy()
    np.testing.assert_allclose(np.asarray(score), ref, atol=1e-3)


def test_preprocess_frames_geometry():
    frames = np.random.RandomState(2).rand(3, 50, 90, 3).astype(np.float32)
    out = preprocess_frames(frames, image_size=28)
    assert out.shape == (3, 28, 28, 3)
    assert np.isfinite(np.asarray(out)).all()
    # a constant-0.5 gray frame maps to the exact normalized constant
    gray = preprocess_frames(np.full((1, 40, 40, 3), 0.5, np.float32),
                             image_size=28)
    from videoswap_tpu.models.clip_vision import (CLIP_IMAGE_MEAN,
                                                  CLIP_IMAGE_STD)
    expect = (0.5 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(np.asarray(gray)[0, 0, 0], expect, rtol=1e-5)
