"""Tokenizer loading.

The reference loads a CLIPTokenizer from the local pretrained dir
(reference train.py:49-52); so do we (transformers needs no network for
local files). For tests and weightless smoke runs a deterministic
`HashTokenizer` stands in: same public surface (`__call__` with
max_length/padding, `model_max_length`, `add_tokens`, `convert_tokens_to_ids`)
but ids are stable hashes — fine because smoke weights are random anyway.
"""

from __future__ import annotations

import os
import re


class HashTokenizer:
    model_max_length = 77
    bos_token_id = 49406
    eos_token_id = 49407

    def __init__(self, vocab_size: int = 49408):
        self.vocab_size = vocab_size
        self._added: dict[str, int] = {}

    def add_tokens(self, tokens) -> int:
        if isinstance(tokens, str):
            tokens = [tokens]
        for t in tokens:
            if t not in self._added:
                self._added[t] = self.vocab_size + len(self._added)
        return len(tokens)

    def __len__(self):
        return self.vocab_size + len(self._added)

    def convert_tokens_to_ids(self, token: str) -> int:
        if token in self._added:
            return self._added[token]
        # crc32, not hash(): python salts str hashes per process, which would
        # make a weightless train->test CLI sequence non-reproducible
        import zlib
        return 2 + (zlib.crc32(token.encode('utf-8')) % (self.vocab_size - 3))

    def _word_ids(self, text: str) -> list[int]:
        # added tokens match case-sensitively BEFORE lowercasing — same as
        # transformers' AddedToken splitting (CLIPTokenizer lowercases only
        # the remaining text). Without this, `<catA1_0>` never resolves to
        # its extra-embedding row and concept training gets zero gradient.
        words = re.findall(r'<[^>]+>|\w+|[^\w\s]', text)
        return [self._added[w] if w in self._added
                else self.convert_tokens_to_ids(w.lower()) for w in words]

    def __call__(self, text, padding='max_length', max_length=None,
                 truncation=True, return_tensors=None):
        import numpy as np
        if isinstance(text, str):
            text = [text]
        max_length = max_length or self.model_max_length
        out = []
        for t in text:
            ids = [self.bos_token_id] + self._word_ids(t)
            ids = ids[:max_length - 1] + [self.eos_token_id]
            if padding == 'max_length':
                ids = ids + [self.eos_token_id] * (max_length - len(ids))
            out.append(ids)

        class R:
            input_ids = np.asarray(out, dtype=np.int32)
        return R()


def load_tokenizer(pretrained_model_path: str | None):
    """CLIPTokenizer from `<path>/tokenizer` when present, else the hash
    stand-in (clearly logged)."""
    if pretrained_model_path:
        tok_dir = os.path.join(pretrained_model_path, 'tokenizer')
        if os.path.isdir(tok_dir):
            from transformers import CLIPTokenizer
            return CLIPTokenizer.from_pretrained(tok_dir)
    return HashTokenizer()
