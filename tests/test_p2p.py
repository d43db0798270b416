"""Prompt-to-prompt subsystem tests: alignment mappers, word indices,
time-gated alphas, blend-mask math, site geometry."""

import jax.numpy as jnp
import numpy as np

from videoswap_tpu.p2p import SiteKey, blend, ptp_utils, seq_aligner, sites
from videoswap_tpu.utils.tokenizer import HashTokenizer


def test_refinement_mapper_identity():
    tok = HashTokenizer()
    m, a = seq_aligner.get_refinement_mapper(['a cat runs', 'a cat runs'],
                                             tok)
    # identical prompts: identity mapping, all alphas 1
    assert (m[0][:5] == np.arange(5)).all()
    assert (a[0] == 1).all()


def test_refinement_mapper_substitution():
    tok = HashTokenizer()
    m, a = seq_aligner.get_refinement_mapper(
        ['a cat runs fast', 'a fluffy dog runs fast'], tok)
    m, a = m[0], a[0]
    # tokens: [bos, a, cat, runs, fast, eos] vs
    #         [bos, a, fluffy, dog, runs, fast, eos]
    assert m[0] == 0 and m[1] == 1           # bos, 'a' aligned
    assert a[2] == 0 and a[3] == 0           # 'fluffy', 'dog' are new
    assert m[4] == 3 and a[4] == 1           # 'runs' aligned
    assert m[5] == 4 and a[5] == 1           # 'fast' aligned


def test_replacement_mapper_equal_length():
    tok = HashTokenizer()
    m = seq_aligner.get_replacement_mapper(
        ['a cat runs', 'a dog runs'], tok)[0]
    assert m.shape == (77, 77)
    # each source token maps to exactly one target position
    np.testing.assert_allclose(m.sum(1)[:10], 1.0)
    assert m[2, 2] == 1.0                    # substituted word stays in place
    assert m[1, 1] == 1.0 and m[3, 3] == 1.0


def test_get_word_inds():
    tok = HashTokenizer()
    inds = ptp_utils.get_word_inds('a cat and a cat', 'cat', tok)
    np.testing.assert_array_equal(inds, [2, 5])


def test_time_words_alpha_schedule():
    tok = HashTokenizer()
    alpha = ptp_utils.get_time_words_attention_alpha(
        ['a cat', 'a dog'], 10, 0.4, tok)
    assert alpha.shape == (11, 1, 1, 1, 77)
    # active for steps [0, 4), zero after
    assert alpha[0, 0, 0, 0, 0] == 1 and alpha[3, 0, 0, 0, 0] == 1
    assert alpha[4, 0, 0, 0, 0] == 0
    # 0.0 -> never active (the reference default blend_cfg)
    alpha0 = ptp_utils.get_time_words_attention_alpha(
        ['a cat', 'a dog'], 10, 0.0, tok)
    assert alpha0.max() == 0


def test_site_geometry_512():
    h8 = w8 = 64  # 512x512
    # block0 down sites are 4096 tokens, block1 exactly 1024 (excluded:
    # strict < 32^2, reference attention_store.py:97)
    assert sites.site_tokens(SiteKey('down', 'cross', 0), h8, w8) == 4096
    assert sites.site_tokens(SiteKey('down', 'cross', 2), h8, w8) == 1024
    stored_down = sites.stored_sites('down', 'cross', h8, w8)
    assert [s.index for s in stored_down] == [4, 5]
    # up block1 (idx 0-2) = 256 tokens; block2 = exactly 1024 (excluded)
    stored_up = sites.stored_sites('up', 'cross', h8, w8)
    assert [s.index for s in stored_up] == [0, 1, 2]
    bs = sites.blend_sites(h8, w8)
    # down[2:4] empty (only 2 stored), up[:3] -> 3 sites, all 16x16 maps
    assert len(bs) == 3
    assert all(sites.site_hw(s, h8, w8) == (16, 16) for s in bs)


def test_site_geometry_448x768():
    h8, w8 = 56, 96
    bs = sites.blend_sites(h8, w8)
    assert len(bs) == 3
    assert all(sites.site_hw(s, h8, w8) == (14, 24) for s in bs)


def test_blend_mask_selects_hot_region():
    f, heads, rh, rw = 2, 2, 8, 8
    maps = np.zeros((1, f, heads, rh * rw, 77), np.float32)
    # word 3 attends strongly to a 2x2 region around (2, 2)
    m2 = maps.reshape(1, f, heads, rh, rw, 77)
    m2[..., 2:4, 2:4, 3] = 1.0
    alpha = np.zeros((1, 77), np.float32)
    alpha[0, 3] = 1.0
    mask = blend.blend_mask([jnp.asarray(maps)], jnp.asarray(alpha),
                            th=0.3, out_hw=(16, 16), height=64, width=64)
    mask = np.asarray(mask)
    assert mask.shape == (1, f, 16, 16)
    assert mask[0, 0, 5, 5]          # inside (scaled + pooled) hot region
    assert not mask[0, 0, 15, 15]    # far corner stays cold


def test_union_both_and_latent_blend():
    m = jnp.asarray(np.array([[[[True, False]]], [[[False, True]]]]))
    u = blend.union_both(m)
    assert bool(u[1, 0, 0, 0]) and bool(u[1, 0, 0, 1])
    x_src = jnp.zeros((1, 1, 1, 2, 3))
    x_tgt = jnp.ones((1, 1, 1, 2, 3))
    out = blend.latent_blend(x_src, x_tgt, u[1])
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, :, 0]), [1.0, 1.0])
