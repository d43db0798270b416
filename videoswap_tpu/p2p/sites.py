"""Static attention-site geometry for the SD-1.5 3D U-Net.

The controllers address attention maps as ordered lists per
(place, kind) among the STORED sites — those with strictly fewer than 32^2
query tokens (reference attention_store.py:97, attention_register.py:66).
Everything here is static given the latent (h8, w8), so the controller
wiring is resolved at trace time.
"""

from __future__ import annotations

from .ctrl import SiteKey

CTRL_MAX_TOKENS = 32 ** 2   # strictly-less threshold

# SD-1.5 structure: 3 cross-attn down blocks x 2 layers, 1 mid, 3 cross-attn
# up blocks x 3 layers.
_DOWN_LAYERS = 2
_UP_LAYERS = 3


def site_tokens(site: SiteKey, h8: int, w8: int) -> int:
    """Query-token count of a spatial attention site at latent (h8, w8)."""
    if site.place == 'down':
        block = site.index // _DOWN_LAYERS
        div = 2 ** block
    elif site.place == 'mid':
        div = 8
    else:
        block = site.index // _UP_LAYERS + 1    # up blocks 1..3 have attn
        div = 2 ** (3 - block)
    return (h8 // div) * (w8 // div)


def site_hw(site: SiteKey, h8: int, w8: int) -> tuple[int, int]:
    if site.place == 'down':
        div = 2 ** (site.index // _DOWN_LAYERS)
    elif site.place == 'mid':
        div = 8
    else:
        div = 2 ** (3 - (site.index // _UP_LAYERS + 1))
    return h8 // div, w8 // div


def all_sites(kind: str) -> list[SiteKey]:
    sites = [SiteKey('down', kind, i) for i in range(3 * _DOWN_LAYERS)]
    sites += [SiteKey('mid', kind, 0)]
    sites += [SiteKey('up', kind, i) for i in range(3 * _UP_LAYERS)]
    return sites


def stored_sites(place: str, kind: str, h8: int, w8: int) -> list[SiteKey]:
    """Sites of (place, kind), walk order, with q-tokens < 32^2."""
    return [s for s in all_sites(kind)
            if s.place == place and site_tokens(s, h8, w8) < CTRL_MAX_TOKENS]


def blend_sites(h8: int, w8: int) -> list[SiteKey]:
    """The cross-attn maps the SpatialBlender consumes:
    stored down_cross[2:4] + stored up_cross[:3]
    (reference spatial_blend.py:90). At production resolutions these all
    share one map resolution (asserted by the caller)."""
    return (stored_sites('down', 'cross', h8, w8)[2:4]
            + stored_sites('up', 'cross', h8, w8)[:3])
