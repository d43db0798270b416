"""Functional attention control ("attention taps").

The reference injects prompt-to-prompt behavior by monkey-patching diffusers
`Attention.processor` objects at runtime (/root/reference/videoswap/utils/
p2p_utils/attention_register.py:176-211). Under jit that pattern is
impossible and unnecessary: here every spatial attention site in the U-Net
has a static identity (`SiteKey`), and a single `AttnCtrl` object threaded
through the forward decides, per site,

- whether to *capture* the attention probabilities (sown into the
  'attn_store' collection, returned by `Module.apply(..., mutable=...)`), and
- whether to *rewrite* them via `edit_fn(probs, site=..., state=...)`
  before the value contraction.

`AttnCtrl` is a pytree: the (traced) edit state arrays are children; the
mode flags and the edit/store callables are static aux data, so jit traces
one specialized program per controller configuration.

Only sites whose query length is strictly < `max_tokens` are tapped, matching
the reference's strict 32**2 threshold (attention_store.py:97) — large sites
always run the fused/flash path.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax


class SiteKey(NamedTuple):
    place: str    # 'down' | 'mid' | 'up'
    kind: str     # 'self' | 'cross'
    index: int    # per-(place, kind) position in the reference walk order

    @property
    def name(self) -> str:
        return f'{self.place}_{self.kind}_{self.index}'


@jax.tree_util.register_pytree_node_class
class AttnCtrl:
    """mode: 'none' (fused everywhere), 'store', 'edit', or 'store_edit'."""

    def __init__(self, mode: str = 'none',
                 store_filter: Optional[Callable[[SiteKey, int], bool]] = None,
                 edit_fn: Optional[Callable] = None,
                 state: Any = None,
                 max_tokens: int = 1024):
        assert mode in ('none', 'store', 'edit', 'store_edit')
        self.mode = mode
        self.store_filter = store_filter
        self.edit_fn = edit_fn
        self.state = state
        self.max_tokens = max_tokens

    # -- queries used by the attention sites -------------------------------
    def wants_store(self, site: SiteKey, q_tokens: int) -> bool:
        # strict <, like the reference's `attn.shape[1] <= 32 ** 2` guard on
        # (h*w) maps (attention_store.py:97): a 32x32 site (1024 q tokens)
        # is NOT stored
        if (self.mode not in ('store', 'store_edit')
                or q_tokens >= self.max_tokens):
            return False
        return self.store_filter is None or self.store_filter(site, q_tokens)

    def get_edit_fn(self, site: SiteKey, q_tokens: int):
        if (self.mode not in ('edit', 'store_edit')
                or q_tokens >= self.max_tokens):
            return None
        if self.edit_fn is None:
            return None
        fn = self.edit_fn(site, q_tokens, self.state)
        return fn  # may be None when this site is not edited

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.state,), (self.mode, self.store_filter, self.edit_fn,
                               self.max_tokens)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mode, store_filter, edit_fn, max_tokens = aux
        return cls(mode=mode, store_filter=store_filter, edit_fn=edit_fn,
                   state=children[0], max_tokens=max_tokens)


NO_CTRL = AttnCtrl()
