"""The PRODUCTION tokenizer branch: a real `transformers.CLIPTokenizer`
loaded through utils/tokenizer.py (the branch the reference hits at
train.py:49-52), built offline from a minimal generated vocab.json /
merges.txt — no network, no pretrained weights.

Re-runs the ED-LoRA added-token + casing assertions (found on
HashTokenizer in round 4, CLAUDE.md) against the real tokenizer: added
concept tokens like `<catA1_0>` carry an UPPERCASE letter; CLIPTokenizer
lowercases text during BPE, so the added-token match must happen first or
the concept id never appears and its embedding row gets zero gradient.
"""

import json
import os

import numpy as np
import pytest

from videoswap_tpu.utils.tokenizer import HashTokenizer, load_tokenizer

CHARS = list('abcdefghijklmnopqrstuvwxyz0123456789<>_')


@pytest.fixture(scope='module')
def clip_dir(tmp_path_factory):
    """Minimal char-level CLIP tokenizer dir: no merges, so every ordinary
    word BPE-splits into characters (+ word-final marker)."""
    root = tmp_path_factory.mktemp('sd_dir')
    tok_dir = root / 'tokenizer'
    tok_dir.mkdir()
    vocab = {}
    for c in CHARS:
        vocab[c] = len(vocab)
    for c in CHARS:
        vocab[c + '</w>'] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    with open(tok_dir / 'vocab.json', 'w') as f:
        json.dump(vocab, f)
    with open(tok_dir / 'merges.txt', 'w') as f:
        f.write('#version: 0.2\n')
    with open(tok_dir / 'tokenizer_config.json', 'w') as f:
        json.dump({'model_max_length': 77, 'do_lower_case': True,
                   'tokenizer_class': 'CLIPTokenizer'}, f)
    with open(tok_dir / 'special_tokens_map.json', 'w') as f:
        json.dump({'bos_token': '<|startoftext|>',
                   'eos_token': '<|endoftext|>',
                   'unk_token': '<|endoftext|>',
                   'pad_token': '<|endoftext|>'}, f)
    return str(root)


def test_load_tokenizer_production_branch(clip_dir):
    tok = load_tokenizer(clip_dir)
    assert type(tok).__name__ == 'CLIPTokenizer'
    ids = tok(['a photo of a cat'], padding='max_length', max_length=77,
              truncation=True).input_ids
    arr = np.asarray(ids)
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.bos_token_id
    # no merges in the fixture: ordinary words BPE-split into characters
    # with the word-final marker on the last one
    assert tok.convert_tokens_to_ids('t</w>') in arr[0]
    # missing dir falls back to the hash stand-in
    assert isinstance(load_tokenizer(os.path.join(clip_dir, 'nope')),
                      HashTokenizer)


def test_edlora_added_token_casing(clip_dir):
    """The round-4 HashTokenizer gotcha, on the real tokenizer: mixed-case
    added tokens must survive do_lower_case as single ids (ids >= base
    vocab — the condition for the concept embedding to receive gradient)."""
    tok = load_tokenizer(clip_dir)
    n0 = len(tok)
    names = [f'<catA1_{i}>' for i in range(16)]
    tok.add_tokens(names)
    ids = [tok.convert_tokens_to_ids(n) for n in names]
    assert min(ids) >= n0, 'added tokens collided with the base vocab'
    assert len(set(ids)) == 16

    enc = np.asarray(tok(['a <catA1_5> on grass'], padding='max_length',
                         max_length=77, truncation=True).input_ids)[0]
    assert ids[5] in enc, 'mixed-case added token lost to lowercasing'
    # the RAW concept word (what a config prompt contains pre-expansion)
    # must NOT hit any added token — lowercased char split instead
    enc_raw = np.asarray(tok(['a catA1 on grass'], padding='max_length',
                             max_length=77, truncation=True).input_ids)[0]
    assert not (set(ids) & set(enc_raw.tolist()))


def test_layer_prompts_and_word_inds(clip_dir):
    """tokenize_layer_prompts + get_word_inds through the real tokenizer's
    subword decode path: each of the 16 layer rows carries exactly its own
    layer token, and the p2p word indexer finds the concept's position."""
    from videoswap_tpu.edlora_train import (register_concepts,
                                            tokenize_layer_prompts)
    from videoswap_tpu.p2p.ptp_utils import get_word_inds

    tok = load_tokenizer(clip_dir)
    cfg = register_concepts(tok, ['catA1'])
    ids = np.asarray(tokenize_layer_prompts(tok, 'a photo of a catA1', cfg))
    assert ids.shape == (16, 77)
    layer_ids = [tok.convert_tokens_to_ids(n)
                 for n in cfg['catA1']['concept_token_names']]
    for layer in range(16):
        row = set(ids[layer].tolist())
        assert layer_ids[layer] in row
        assert not (set(layer_ids) - {layer_ids[layer]}) & row, \
            f'layer {layer} row carries other layers\' tokens'
    # rows differ pairwise (each layer sees its own embedding row)
    assert len({tuple(r) for r in ids.tolist()}) == 16

    tok.new_concept_cfg = cfg
    inds = get_word_inds('a catA1 on grass', 'catA1', tok)
    # BOS at 0, 'a' at 1 -> concept token at 2
    np.testing.assert_array_equal(inds, [2])

    # multi-subword ordinary words index ALL their pieces ('photo' has no
    # whole-word vocab entry -> 5 char tokens after BOS + 'a')
    inds_photo = get_word_inds('a photo of a cat', 'photo', tok)
    assert len(inds_photo) == 5 and inds_photo[0] == 2


def test_hash_tokenizer_semantics_match(clip_dir):
    """The stand-in and the real tokenizer agree on the semantics the
    framework depends on (not on ids): added-token precedence over
    lowercasing, one id per added token, concept-id-in-prompt placement."""
    real = load_tokenizer(clip_dir)
    fake = HashTokenizer()
    for tok in (real, fake):
        n0 = len(tok)
        tok.add_tokens(['<dogB2_0>'])
        tid = tok.convert_tokens_to_ids('<dogB2_0>')
        assert tid >= n0
        enc = np.asarray(tok(['a <dogB2_0> runs'], padding='max_length',
                             max_length=77, truncation=True).input_ids)[0]
        assert (enc == tid).sum() == 1
