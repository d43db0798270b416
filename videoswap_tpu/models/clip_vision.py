"""CLIP vision tower (ViT-L/14) + the full CLIP scorer in flax.

BASELINE.md's quality target is "frame PSNR / CLIP parity with the
PyTorch reference" — measuring CLIP(frame, target prompt) needs the image
tower beside the already-built text tower (models/clip_text.py). The
reference repo never loads a vision tower itself (its quality claims are
visual, /root/reference/README.md:25-29); this is the measurement surface
for them.

Parameter naming mirrors the transformers key layout
(vision_model.embeddings.patch_embedding, vision_model.pre_layrnorm —
[sic], transformers' own typo — vision_model.encoder.layers.N...), so
`converters.convert_clip_vision` is mechanical. The encoder layers are the
exact text-tower blocks (clip_text.CLIPEncoderLayer) with no causal mask.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from .clip_text import CLIPEncoderLayer


class CLIPVisionConfig(NamedTuple):
    # ViT-L/14 defaults (the vision tower paired with SD-1.5's text tower)
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: [B, H, W, 3] (channels-last, already normalized).
        Returns (last_hidden_state [B, 1+P, D], pooled [B, D]) — pooled is
        the post-layernormed class token, transformers semantics."""
        cfg = self.cfg
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=False, dtype=self.dtype,
                    name='patch_embedding')(pixel_values)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)           # [B, P, D]
        cls = self.param('class_embedding',
                         nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype),
                              (b, 1, cfg.hidden_size)), x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param('position_embedding',
                         nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size))
        x = x + pos[None, :x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name='pre_layrnorm')(x)        # [sic] transformers
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype,
                                 name=f'layers_{i}')(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name='post_layernorm')(x[:, 0])
        return x, pooled


class CLIPWithProjection(nn.Module):
    """Both towers + the projection heads: everything `clip_score` needs.

    Key layout matches the full transformers CLIPModel
    (visual_projection.weight / text_projection.weight, bias-free)."""
    vision_cfg: CLIPVisionConfig = CLIPVisionConfig()
    text_cfg: 'CLIPTextConfig' = None  # default filled in __post_init__
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from .clip_text import CLIPTextConfig, CLIPTextModel
        tc = self.text_cfg or CLIPTextConfig()
        self.text_model = CLIPTextModel(tc, dtype=self.dtype)
        self.vision_model = CLIPVisionModel(self.vision_cfg,
                                            dtype=self.dtype)
        self.visual_projection = nn.Dense(
            self.vision_cfg.projection_dim, use_bias=False,
            dtype=self.dtype, name='visual_projection')
        self.text_projection = nn.Dense(
            self.vision_cfg.projection_dim, use_bias=False,
            dtype=self.dtype, name='text_projection')

    def image_embeds(self, pixel_values):
        _, pooled = self.vision_model(pixel_values)
        e = self.visual_projection(pooled)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def text_embeds(self, input_ids):
        hidden = self.text_model(input_ids)
        # transformers pooling: the EOT token has the highest vocab id
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eot]
        e = self.text_projection(pooled)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def __call__(self, pixel_values, input_ids):
        """Per-(image, text) CLIP score: 100 * max(0, cosine). The
        torchmetrics CLIPScore definition."""
        img = self.image_embeds(pixel_values)
        txt = self.text_embeds(input_ids)
        return jnp.maximum(jnp.einsum('bd,bd->b', img, txt), 0.0) * 100.0


# openai CLIP preprocessing constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_frames(frames, image_size: int = 224) -> jnp.ndarray:
    """(F, H, W, 3) float [0,1] -> CLIP pixel_values [F, S, S, 3]:
    resize shortest side to S (bilinear — PIL-bicubic parity is not needed
    for a scalar score), center crop, normalize."""
    import jax
    v = jnp.asarray(frames, jnp.float32)
    f, h, w = v.shape[:3]
    scale = image_size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    v = jax.image.resize(v, (f, nh, nw, 3), method='bilinear')
    y0, x0 = (nh - image_size) // 2, (nw - image_size) // 2
    v = v[:, y0:y0 + image_size, x0:x0 + image_size]
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (v - mean) / std
