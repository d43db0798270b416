"""VideoSwap inference pipeline: DDIM inversion + guided re-denoising with
prompt-to-prompt attention control and spatial latent blending.

Functional counterpart of the reference VideoSwapPipeline
(/root/reference/videoswap/pipelines/pipeline_videoswap.py:87-721),
TPU-first:

- the 50-step DDIM loops are single `lax.scan`s inside one jit; latents and
  every stored per-step tensor stay in HBM (the reference round-trips
  attention maps and latents to CPU each step, attention_store.py:73, 98);
- the inversion store is a scan output: per-step latents + exactly the
  attention maps the edit will consume — selected statically from the edit
  config instead of the reference's store-everything-<=32^2;
- prompt-to-prompt control is an `EditBundle` (videoswap_tpu/p2p/edit.py):
  reversed inversion arrays enter the sampling scan as xs, running map sums
  ride the carry, and per-site probability rewrites run inside the U-Net —
  replacing the reference's processor monkey-patching + CPU stores;
- classifier-free guidance is the [uncond; cond] batch of the reference
  (__call__ :558-584), the adapter residual window `t2i_start/t2i_end` a
  multiply gate on the step index (:561-564);
- ED-LoRA weight merges swap param VALUES only, so compiled samplers are
  reused across concepts (structure-stable jit cache).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videoswap_tpu.models import AnimateDiffUNet3DModel, SparsePointAdapter
from videoswap_tpu.models.clip_text import CLIPTextModel
from videoswap_tpu.models.vae import AutoencoderKL
from videoswap_tpu.p2p import NO_CTRL, AttnCtrl
from videoswap_tpu.p2p import sites as sites_mod
from videoswap_tpu.p2p.edit import (EditBundle, _flatten_attn_store,
                                    inversion_store_filter,
                                    latent_blend_step, make_edit_bundle,
                                    make_store_edit_ctrl,
                                    self_masks_for_step,
                                    want_recompute_self)
from videoswap_tpu.schedulers import (DiffusionSchedule, ddim_inverse_step,
                                      ddim_inverse_timesteps, ddim_step,
                                      ddim_timesteps, dpm_pp_2m_step)
from videoswap_tpu.utils.image import postprocess_video, preprocess_video
from videoswap_tpu.utils.registry import PIPELINE_REGISTRY


def make_target_prompt(source_prompt: str, swap_cfg: dict) -> str:
    """source prompt + swap config 'replace'/'replace_other' rules ->
    target prompt (reference test-time prompt assembly; also reused by
    test.py's CLIP-score metrics)."""
    src_subj, tgt_subj = [s.strip() for s in swap_cfg['replace'].split('->')]
    assert src_subj in source_prompt, 'source subject need in source prompt'
    target_prompt = source_prompt.replace(src_subj, tgt_subj)
    if 'replace_other' in swap_cfg:
        so, to = [s.strip() for s in swap_cfg['replace_other'].split('->')]
        assert so in target_prompt
        target_prompt = target_prompt.replace(so, to)
    return target_prompt


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """arXiv:2305.08891 §3.4 (reference pipeline :582-584)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return (guidance_rescale * rescaled
            + (1 - guidance_rescale) * noise_cfg)


@PIPELINE_REGISTRY.register()
@dataclass
class VideoSwapPipeline:
    unet: AnimateDiffUNet3DModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    tokenizer: Any
    sched: DiffusionSchedule
    adapter: Optional[SparsePointAdapter] = None
    params: dict = field(default_factory=dict)   # unet/vae/text_encoder/adapter
    extra_token_embeds: Optional[jnp.ndarray] = None  # ED-LoRA concept rows
    new_concept_cfg: Optional[dict] = None
    eager: bool = False  # skip ALL jit (op-by-op dispatch): the compile-free
    #                      ground-truth path for the multichip dryrun
    mesh: Any = None     # set by parallel.shard_pipeline: dp/sp-shard the
    #                      source pixels and sampling latents (tp rides the
    #                      already-sharded U-Net params)
    _jit_cache: dict = field(default_factory=dict)

    def _shard_video(self, x, frame_axis: int = 1):
        if self.mesh is None:
            return x
        from videoswap_tpu.parallel.sharding import video_sharding
        return jax.device_put(
            x, video_sharding(self.mesh, x.shape, frame_axis))

    def _canonical_per_step(self, per_step):
        """Sharded mode only: per-step inversion outputs leave the compiled
        program with whatever tiling GSPMD propagation chose, which need
        not be expressible as a NamedSharding of the mesh (observed: a
        [1,2,2,1,1,2] tile assignment on (N,B,F,h,w,4) under a (1,2,4)
        mesh). Host-side edit-bundle prep then fails to dispatch eager
        slicing/reversal on them. Re-lay them out replicated — they are
        small (sub-32^2 maps + latent trajectory) and are consumed as scan
        inputs where GSPMD re-shards as needed. No-op single-device."""
        if self.mesh is None:
            return per_step
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), rep), per_step)

    # ------------------------------------------------------------------ text
    def encode_prompt_ids(self, prompts: list[str]) -> np.ndarray:
        return self.tokenizer(
            prompts, padding='max_length',
            max_length=self.tokenizer.model_max_length,
            truncation=True).input_ids

    def encode_prompt(self, prompts: list[str]) -> jnp.ndarray:
        """[B, 77, 768] embeds; with active ED-LoRA concepts this becomes
        the layer-wise [B, 16, 77, 768] (videoswap_tpu/edlora.py)."""
        if self.new_concept_cfg:
            from videoswap_tpu.edlora import encode_edlora_prompt
            return encode_edlora_prompt(self, prompts)
        ids = jnp.asarray(np.asarray(self.encode_prompt_ids(prompts)))
        fn = self._cached('text_encode', lambda params, ids, extra:
                          self.text_encoder.apply(
                              params, ids, extra_token_embeds=extra))
        return fn(self.params['text_encoder'], ids, self.extra_token_embeds)

    # ----------------------------------------------------------------- cache
    def _cached(self, key, fn, **jit_kwargs):
        if self.eager:
            return fn
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn, **jit_kwargs)
        return self._jit_cache[key]

    # ------------------------------------------------------------- adapters
    def _adapter_states(self, conditions: Optional[dict], size,
                        t2i_guidance_scale: float, cfg: bool):
        if conditions is None or self.adapter is None:
            return None
        tracks = jnp.asarray(np.asarray(conditions['pred_tracks']))
        emb = jnp.asarray(np.asarray(conditions['point_embedding']))
        index_list = conditions.get('index_list')
        p = tracks.shape[1]
        if index_list is not None:
            mask = np.zeros(p, bool)
            mask[np.asarray(index_list)] = True
        else:
            mask = np.ones(p, bool)
        fn = self._cached(
            ('adapter', size), lambda params, tr, em, ma:
            self.adapter.apply(params, tr, size, em, point_mask=ma))
        states = fn(self.params['adapter'], tracks, emb, jnp.asarray(mask))
        states = [s[None] * t2i_guidance_scale for s in states]  # add batch
        if cfg:
            states = [jnp.concatenate([s, s], axis=0) for s in states]
        return states

    @staticmethod
    def _default_loop(loop: str) -> str:
        """'scan' compiles the whole DDIM loop into one XLA while-loop —
        ideal on CPU/plain TPU. Through the axon remote-compile tunnel the
        full-size scan compiles pathologically slowly (hours), while a
        single step compiles in ~1 min. 'chunk' is the middle ground: a
        short `lax.scan` of VS_CHUNK steps per dispatch (host loop over
        chunks), amortizing the ~11 ms/step dispatch overhead of the
        single-step host loop without the full-scan compile — measured at
        bench shapes (512^2 x 16f x 50 steps): python 17.1 s, chunk K=5
        16.60 s, K=10 16.53 s, with much tighter run-to-run variance. So
        'auto' picks 'chunk' on TPU. VS_LOOP overrides 'auto' for A/B
        runs."""
        if loop != 'auto':
            return loop
        env = os.environ.get('VS_LOOP', '')
        if env in ('scan', 'python', 'chunk'):
            return env
        import jax as _jax
        return 'chunk' if _jax.default_backend() == 'tpu' else 'scan'

    @staticmethod
    def _chunk_size() -> int:
        return max(1, int(os.environ.get('VS_CHUNK', '10')))

    # ------------------------------------------------------------ inversion
    def invert(self, video, prompt: str, num_inference_steps: int = 50,
               store_ctrl: AttnCtrl = NO_CTRL, loop: str = 'auto'):
        """DDIM-invert a source video (reference `invert`, :621-721).

        Returns (inverted_latents [B,F,h,w,4], per_step dict with 'latents'
        [N,B,F,h,w,4] (post-step), 'z0' [B,F,h,w,4] (the encoded latents
        before any inverse step), 'ts' [N] inversion timesteps, and 'attn'
        {site: [N, F, heads, S, T]}).

        guidance_scale is 1 during inversion (reference :627), so no CFG.
        The VAE posterior MODE is used (deterministic inversion; the
        reference samples the posterior with the global torch RNG, which is
        unseeded nondeterminism we deliberately drop).
        """
        pixels = jnp.asarray(preprocess_video(video)) \
            if not isinstance(video, (jnp.ndarray, np.ndarray)) \
            else jnp.asarray(video)
        pixels = self._shard_video(pixels)
        text = self.encode_prompt([prompt])
        ts = jnp.asarray(ddim_inverse_timesteps(
            self.sched.num_train_timesteps, num_inference_steps))

        want_store = store_ctrl.mode != 'none'
        loop = self._default_loop(loop)

        def body(params, lat, t, text):
            if want_store:
                eps, v = self.unet.apply(
                    params['unet'], lat, t, text, ctrl=store_ctrl,
                    mutable=['attn_store'])
                store = _flatten_attn_store(v['attn_store'])
                store = {k: a.astype(lat.dtype) for k, a in store.items()}
            else:
                eps = self.unet.apply(params['unet'], lat, t, text)
                store = {}
            new_lat = ddim_inverse_step(
                self.sched, eps, t, lat,
                num_inference_steps).astype(lat.dtype)
            return new_lat, store

        def encode(params, pixels, text):
            latents = self.vae.apply(params['vae'],
                                     pixels.astype(jnp.float32),
                                     method=AutoencoderKL.encode_video)
            return latents.astype(text.dtype)

        if loop == 'scan':
            def fn(params, pixels, text):
                latents = encode(params, pixels, text)

                def scan_body(lat, t):
                    new_lat, store = body(params, lat, t, text)
                    return new_lat, {'latents': new_lat, 'attn': store}

                lat, per = jax.lax.scan(scan_body, latents, ts)
                return lat, per, latents

            jfn = self._cached(('invert', num_inference_steps, pixels.shape,
                                want_store, store_ctrl.mode), fn)
            lat, per_step, z0 = jfn(self.params, pixels, text)
            per_step = dict(per_step, z0=z0, ts=ts, src_text=text)
            return lat, self._canonical_per_step(per_step)

        enc = self._cached(('invert_enc', pixels.shape),
                           lambda params, px, tx: encode(params, px, tx))
        if loop == 'chunk':
            kk = self._chunk_size()

            def chunk_fn(k_steps):
                def fn(params, lat, i0, ts_arr, text):
                    def sbody(lat, j):
                        new_lat, store = body(params, lat, ts_arr[i0 + j],
                                              text)
                        return new_lat, {'latents': new_lat, 'attn': store}

                    return jax.lax.scan(sbody, lat, jnp.arange(k_steps))
                return fn

            lat = enc(self.params, pixels, text)
            z0 = lat
            pers = []
            i0, n_ts = 0, len(np.asarray(ts))
            while i0 < n_ts:
                k = min(kk, n_ts - i0)
                cj = self._cached(('invert_chunk', num_inference_steps,
                                   pixels.shape, want_store,
                                   store_ctrl.mode, k), chunk_fn(k))
                lat, per = cj(self.params, lat, np.int32(i0), ts, text)
                pers.append(per)
                i0 += k
            per_step = jax.tree.map(lambda *xs: jnp.concatenate(xs), *pers)
            per_step = dict(per_step, z0=z0, ts=ts, src_text=text)
            if not want_store:
                per_step['attn'] = {}
            return lat, per_step

        step = self._cached(('invert_step', num_inference_steps,
                             pixels.shape, want_store, store_ctrl.mode),
                            lambda params, lat, i, ts_arr, text:
                            body(params, lat, ts_arr[i], text))
        lat = enc(self.params, pixels, text)
        z0 = lat
        lat_hist, attn_hist = [], []
        for i in range(len(np.asarray(ts))):
            lat, store = step(self.params, lat, np.int32(i), ts, text)
            lat_hist.append(lat)
            attn_hist.append(store)
        per_step = {
            'latents': jnp.stack(lat_hist),
            'z0': z0,
            'ts': ts,
            'src_text': text,
            'attn': jax.tree.map(lambda *xs: jnp.stack(xs), *attn_hist)
            if want_store else {},
        }
        return lat, self._canonical_per_step(per_step)

    # ------------------------------------------------------------- sampling
    def sample(self,
               prompt: str,
               video_length: int,
               height: int,
               width: int,
               num_inference_steps: int = 50,
               guidance_scale: float = 7.5,
               negative_prompt: Optional[str] = None,
               latents: Optional[jnp.ndarray] = None,
               conditions: Optional[dict] = None,
               t2i_guidance_scale: float = 1.0,
               t2i_start: float = 0.0,
               t2i_end: float = 1.0,
               guidance_rescale: float = 0.0,
               edit_bundle: Optional[EditBundle] = None,
               rng: Optional[jax.Array] = None,
               loop: str = 'auto',
               output_type: str = 'pil',
               return_attn_sums: bool = False,
               sampler: str = 'ddim'):
        """The reference `__call__` (:426-619): CFG DDIM sampling from
        (usually) inverted latents with point-adapter residual guidance and
        optional prompt-to-prompt control + latent blending.

        `sampler`: 'ddim' (reference parity) or 'dpmpp_2m'
        (DPM-Solver++(2M), schedulers/dpm.py) — a second-order multistep
        solver on the same timestep grid, so ~20 steps reach quality the
        reference needs 50 DDIM steps for. Step-indexed behaviors (adapter
        window, p2p schedules, blending) are unchanged."""
        assert sampler in ('ddim', 'dpmpp_2m'), sampler
        use_dpm = sampler == 'dpmpp_2m'
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = negative_prompt or ''
            text = self.encode_prompt([neg, prompt])
        else:
            text = self.encode_prompt([prompt])

        h8, w8 = height // 8, width // 8
        if latents is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            latents = (jax.random.normal(
                rng, (1, video_length, h8, w8, 4), jnp.float32)
                * self.sched.init_noise_sigma).astype(text.dtype)
        latents = self._shard_video(jnp.asarray(latents).astype(text.dtype))

        adapter_states = self._adapter_states(
            conditions, (width, height), t2i_guidance_scale, do_cfg)
        has_adapter = adapter_states is not None

        ts = jnp.asarray(ddim_timesteps(self.sched.num_train_timesteps,
                                        num_inference_steps))
        n = num_inference_steps
        lo = t2i_start * n
        hi = t2i_end * n

        ecfg = edit_bundle.cfg if edit_bundle is not None else None
        do_edit = ecfg is not None
        loop = self._default_loop(loop)

        # CFG-prefix dedup: the [uncond; cond] halves are identical until
        # text enters at the first cross-attention (t and adapter residuals
        # are duplicated), so the U-Net runs the prefix once on B=1 and
        # doubles in-graph. Controllers cannot touch the dedup region (all
        # its sites exceed the <32^2 control threshold at 256^2+ images).
        dedup = bool(do_cfg and latents.shape[0] == 1
                     and (height // 8) * (width // 8) >= 1024)

        def step_body(params, carry, step, text, adapter_states, estate):
            lat, sums = carry[0], carry[1]
            prev_x0 = carry[2] if use_dpm else None
            i, t = step['i'], step['t']
            inp = lat if (not do_cfg or dedup) \
                else jnp.concatenate([lat, lat], 0)
            if has_adapter:
                gate = ((i >= lo) & (i <= hi)).astype(inp.dtype)
                res = [s * gate for s in adapter_states]
            else:
                res = None

            tgt_maps = {}
            if do_edit:
                state = {'alpha_words': estate['alpha_words'][i]}
                state['base'] = step.get('base_cross', {})
                if 'base_self' in step:
                    state['base_self'] = step['base_self']
                    state['self_on'] = ((i >= ecfg.self_range[0])
                                        & (i < ecfg.self_range[1]))
                elif ecfg.recompute_self:
                    # regenerate inversion step N-1-i's self maps from the
                    # stored pre-step latent (HBM-resident stores would be
                    # ~5 GB at 512^2; the reference CPU-offloads instead)
                    self_names = set(ecfg.self_site_names)
                    store_ctrl = AttnCtrl(
                        mode='store',
                        store_filter=lambda site, q:
                            site.name in self_names)
                    self_on = ((i >= ecfg.self_range[0])
                               & (i < ecfg.self_range[1]))

                    def _recompute(args):
                        lat_pre, t_inv = args
                        # regenerate with the INVERSION-time U-Net params:
                        # during an ED-LoRA swap `params['unet']` carries
                        # the merged concept weights, but the stored maps
                        # this path substitutes for came from the pristine
                        # inversion (reference stores during inversion,
                        # attention_store.py:95-100). Same buffers when no
                        # merge happened.
                        _, v = self.unet.apply(
                            estate.get('inv_unet', params['unet']),
                            lat_pre, t_inv,
                            estate['src_text'], ctrl=store_ctrl,
                            mutable=['attn_store'])
                        maps = _flatten_attn_store(v['attn_store'])
                        return tuple(maps[n].astype(jnp.float32)
                                     for n in ecfg.self_site_names)

                    def _shapes(args):
                        lat_pre, _ = args
                        f_ = ecfg.video_length
                        outs = []
                        for n in ecfg.self_site_names:
                            for s_ in sites_mod.all_sites('self'):
                                if s_.name == n:
                                    tok = sites_mod.site_tokens(
                                        s_, ecfg.h8, ecfg.w8)
                                    break
                            outs.append(jnp.zeros(
                                (f_, self.unet.cfg.attention_head_dim,
                                 tok, tok), jnp.float32))
                        return tuple(outs)

                    maps = jax.lax.cond(
                        self_on, _recompute, _shapes,
                        (step['inv_lat_pre'], step['inv_t']))
                    state['base_self'] = dict(
                        zip(ecfg.self_site_names, maps))
                    state['self_on'] = self_on
                if ecfg.blend_self:
                    state['self_mask'] = self_masks_for_step(
                        ecfg, estate, state['base'])
                ctrl = make_store_edit_ctrl(ecfg, estate, state)
                if ctrl.mode == 'store_edit':
                    eps, v = self.unet.apply(
                        params['unet'], inp, t, text,
                        adapter_residuals=res, ctrl=ctrl,
                        cfg_prefix_dedup=dedup,
                        mutable=['attn_store'])
                    f = ecfg.video_length
                    for k, m in _flatten_attn_store(
                            v['attn_store']).items():
                        tgt_maps[k] = m[f:] if do_cfg else m
                else:
                    eps = self.unet.apply(params['unet'], inp, t, text,
                                          adapter_residuals=res,
                                          ctrl=ctrl,
                                          cfg_prefix_dedup=dedup)
            else:
                eps = self.unet.apply(params['unet'], inp, t, text,
                                      adapter_residuals=res,
                                      cfg_prefix_dedup=dedup)

            if do_cfg:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
                if guidance_rescale > 0.0:
                    eps = rescale_noise_cfg(eps, eps_c, guidance_rescale)
            if use_dpm:
                lat, x0 = dpm_pp_2m_step(
                    self.sched, eps.astype(lat.dtype), t, lat, prev_x0, i,
                    num_inference_steps)
            else:
                lat = ddim_step(self.sched, eps.astype(lat.dtype), t, lat,
                                num_inference_steps).astype(lat.dtype)

            if do_edit and ecfg.blend_latents:
                lat, sums = latent_blend_step(
                    ecfg, estate, lat, step['inv_latents'],
                    step['base_cross'], sums, tgt_maps, i)
            return (lat, sums, x0) if use_dpm else (lat, sums)

        if do_edit:
            estate = edit_bundle.static_state
            xs_extra = edit_bundle.xs
            sums0 = edit_bundle.init_sums
        else:
            estate, xs_extra, sums0 = {}, {}, {}

        def init_carry(latents, sums0):
            if use_dpm:
                return (latents, sums0, jnp.zeros_like(latents))
            return (latents, sums0)

        key = ('sample', num_inference_steps, latents.shape, do_cfg,
               has_adapter, guidance_scale, t2i_start, t2i_end,
               t2i_guidance_scale, guidance_rescale, ecfg, loop, sampler)
        if loop == 'scan':
            def fn(params, latents, text, adapter_states, estate, xs_extra,
                   sums0):
                def body(carry, step):
                    return step_body(params, carry, step, text,
                                     adapter_states, estate), None

                xs = {'i': jnp.arange(len(ts)), 't': ts, **xs_extra}
                carry, _ = jax.lax.scan(body, init_carry(latents, sums0),
                                        xs)
                return carry[0], carry[1]

            lat, attn_sums = self._cached(key, fn)(
                self.params, latents, text, adapter_states, estate,
                xs_extra, sums0)
        elif loop == 'chunk':
            # K steps per dispatch via a short lax.scan: amortizes the
            # per-dispatch tunnel overhead (~4-10 ms/step at bench shapes)
            # without the pathological full-loop compile (see
            # _default_loop). Per-step slicing stays in-graph (gathers on
            # the traced index).
            kk = self._chunk_size()

            def chunk_fn(k_steps):
                def fn(params, carry, i0, ts_arr, xs_extra, text,
                       adapter_states, estate):
                    def body(c, j):
                        i = i0 + j
                        step = {'i': i, 't': ts_arr[i]}
                        step.update(jax.tree.map(lambda a: a[i], xs_extra))
                        return step_body(params, c, step, text,
                                         adapter_states, estate), None

                    c, _ = jax.lax.scan(body, carry, jnp.arange(k_steps))
                    return c
                return fn

            carry = init_carry(latents, sums0)
            i0 = 0
            while i0 < len(ts):
                k = min(kk, len(ts) - i0)
                carry = self._cached(key + (k,), chunk_fn(k))(
                    self.params, carry, np.int32(i0), ts, xs_extra, text,
                    adapter_states, estate)
                i0 += k
            lat, attn_sums = carry[0], carry[1]
        else:
            # all per-step slicing happens INSIDE the jit: an eager `ts[i]`
            # or xs_extra slice per step costs a ~10-20 ms axon round trip
            # each (CLAUDE.md), ~1 s over a 50-step loop.
            # loop='eager' skips jit entirely: op-by-op dispatch, zero XLA
            # program compiles — the compile-free ground-truth path for the
            # multichip dryrun's cold-cache budget (CPU only; on axon every
            # eager op is a 10-20 ms round trip).
            def fn(params, carry, i, ts_arr, xs_extra, text, adapter_states,
                   estate):
                step = {'i': i, 't': ts_arr[i]}
                step.update(jax.tree.map(lambda a: a[i], xs_extra))
                return step_body(params, carry, step, text, adapter_states,
                                 estate)

            step_jit = fn if loop == 'eager' else self._cached(key, fn)
            carry = init_carry(latents, sums0)
            for i in range(len(ts)):
                carry = step_jit(self.params, carry, np.int32(i), ts,
                                 xs_extra, text, adapter_states, estate)
            lat, attn_sums = carry[0], carry[1]

        def _wrap(frames):
            # running per-step sums of the editing run's stored target maps
            # (the reference's accumulated attention_store,
            # pipeline_videoswap.py:404-415 / attention_store.py:103-110)
            return (frames, attn_sums) if return_attn_sums else frames

        if output_type == 'latent':
            return _wrap(lat)

        def _decode(params, z):
            img = self.vae.apply(params, z.astype(jnp.float32),
                                 method=AutoencoderKL.decode_video)
            # quantize on-device: 4x smaller host transfer
            return jnp.clip(jnp.round((img + 1.0) * 127.5), 0, 255
                            ).astype(jnp.uint8)

        decode = self._cached(('decode', lat.shape), _decode)
        video = np.asarray(jax.device_get(decode(self.params['vae'], lat)))
        if output_type == 'np':
            return _wrap(video.astype(np.float32) / 127.5 - 1.0)
        from PIL import Image
        return _wrap([Image.fromarray(f) for f in video[0]])

    def _dump_attention_maps(self, prompt: str, frames, key: str,
                             save_dir: str, attn_sums=None,
                             num_steps: int = 50) -> None:
        """Cross-attention heatmaps for a finished edit (reference
        visualize_attention, pipeline_videoswap.py:404-415).

        With `attn_sums` (the editing run's per-step accumulated target
        maps at the blend sites — the reference's summed attention_store)
        the dump aggregates across ALL editing steps exactly like
        get_average_attention (attention_store.py:112-118). Without stores
        (use_blend: false edits) it falls back to one U-Net pass on the
        result's latents at t=261."""
        import os
        from videoswap_tpu.p2p.edit import _flatten_attn_store
        from videoswap_tpu.p2p.visualization import show_cross_attention
        from videoswap_tpu.utils.image import preprocess_video
        from videoswap_tpu.p2p import sites as p2p_sites

        pixels = jnp.asarray(preprocess_video(frames))
        h8, w8 = pixels.shape[2] // 8, pixels.shape[3] // 8

        if attn_sums:
            store = {name: np.asarray(jax.device_get(a)) / num_steps
                     for name, a in attn_sums.items()}
        else:
            store_ctrl = AttnCtrl(
                mode='store',
                store_filter=lambda site, q: site.kind == 'cross')
            text = self.encode_prompt([prompt])

            def fn(params, pixels, text):
                lat = self.vae.apply(params['vae'],
                                     pixels.astype(jnp.float32),
                                     method=AutoencoderKL.encode_video)
                _, v = self.unet.apply(params['unet'],
                                       lat.astype(text.dtype),
                                       jnp.asarray(261), text,
                                       ctrl=store_ctrl,
                                       mutable=['attn_store'])
                return _flatten_attn_store(v['attn_store'])

            store = jax.device_get(self._cached(
                ('attn_viz', pixels.shape), fn)(self.params, pixels, text))
        blend = p2p_sites.blend_sites(h8, w8)
        if blend:
            ry, rx = p2p_sites.site_hw(blend[0], h8, w8)
            show_cross_attention(self.tokenizer, prompt, store, ry, rx,
                                 os.path.join(save_dir, f'{key}_attention'))

    # ------------------------------------------------------------ validation
    def validation(self, source_video, source_conditions, source_prompt,
                   editing_config: dict, train_dataset=None, save_dir=None):
        """Per-editing-prompt swap loop (reference validation, :272-423):
        inversion (storing what the blends/edits need), then per swap —
        transient ED-LoRA merge, conditions override, prompt replacement,
        controller setup, seed-0 sampling, weight restore."""
        import copy as _copy

        cfg = editing_config
        use_inv = cfg.get('use_invertion_latents', True)
        use_blend = cfg.get('use_blend', False)
        steps = cfg.get('num_inference_steps', 50)

        if isinstance(source_video, list):
            width, height = source_video[0].size
            video_length = len(source_video)
        else:
            video_length, height, width = source_video.shape[1:4]
        width, height = width - width % 8, height - height % 8

        ddim_latents, per_step = None, None
        recompute_self = want_recompute_self(cfg, height, width,
                                             video_length, steps)
        if use_inv:
            store_ctrl = NO_CTRL
            if use_blend:
                store_ctrl = AttnCtrl(
                    mode='store',
                    store_filter=inversion_store_filter(
                        cfg, self.tokenizer, height, width,
                        video_length=video_length, num_steps=steps))
            ddim_latents, per_step = self.invert(
                source_video, source_prompt, num_inference_steps=steps,
                store_ctrl=store_ctrl)
        # pristine (pre-any-merge) U-Net params, captured before the swap
        # loop so the recompute-self tier regenerates inversion maps with
        # the weights that produced them even mid-ED-LoRA-swap
        inv_unet_params = self.params['unet'] if recompute_self else None

        results = {}
        for key, swap_cfg in cfg.get('editing_prompts', {}).items():
            lora_ctx = None
            lora_path = swap_cfg.get('lora_path')
            if lora_path:
                from videoswap_tpu.edlora import load_edlora_into_pipeline
                path, alpha = lora_path.rsplit('---', 1)
                lora_ctx = load_edlora_into_pipeline(self, path,
                                                     float(alpha))

            if source_conditions is not None and swap_cfg.get('tap_path'):
                conditions = train_dataset.get_conditions(
                    swap_cfg['tap_path'])
            else:
                conditions = _copy.deepcopy(source_conditions)
            if conditions is not None and swap_cfg.get('select_point'):
                conditions['index_list'] = [
                    conditions['point_name2id'][n]
                    for n in swap_cfg['select_point']]
            elif conditions is not None:
                conditions['index_list'] = None

            src_subj, tgt_subj = [s.strip() for s in
                                  swap_cfg['replace'].split('->')]
            target_prompt = make_target_prompt(source_prompt, swap_cfg)

            guidance_scale = swap_cfg.get(
                'guidance_scale', cfg.get('guidance_scale', 7.5))

            edit_bundle = None
            if use_blend:
                blend_words = [src_subj.split(' '), tgt_subj.split(' ')]
                edit_bundle = make_edit_bundle(
                    self.tokenizer, source_prompt, target_prompt,
                    num_steps=steps, video_length=video_length,
                    height=height, width=width,
                    inv_latents_per_step=per_step['latents'],
                    inv_attn_store=per_step['attn'],
                    blend_words=blend_words,
                    blend_cfg=swap_cfg.get('blend_cfg', {}),
                    do_cfg=guidance_scale > 1.0,
                    recompute_self=recompute_self,
                    inv_z0=per_step.get('z0'), inv_ts=per_step.get('ts'))
                if edit_bundle.cfg.recompute_self:
                    # faithful regeneration: the inversion-time text
                    # embedding and U-Net params (NOT the post-merge,
                    # 16-layer ED-LoRA encode — the stored maps were made
                    # before the concept load)
                    src_text = (per_step or {}).get('src_text')
                    edit_bundle.static_state['src_text'] = (
                        src_text if src_text is not None
                        else self.encode_prompt([source_prompt]))
                    if inv_unet_params is not None:
                        edit_bundle.static_state['inv_unet'] = \
                            inv_unet_params

            want_sums = bool(cfg.get('visualize_attention')
                             and edit_bundle is not None
                             and save_dir is not None)
            frames = self.sample(
                prompt=target_prompt,
                video_length=video_length, height=height, width=width,
                num_inference_steps=steps,
                guidance_scale=guidance_scale,
                negative_prompt=swap_cfg.get(
                    'negative_prompt', cfg.get('negative_prompt')),
                latents=ddim_latents,
                conditions=conditions,
                t2i_guidance_scale=swap_cfg.get(
                    't2i_guidance_scale', cfg.get('t2i_guidance_scale', 1.0)),
                t2i_start=cfg.get('t2i_start', 0.0),
                t2i_end=cfg.get('t2i_end', 1.0),
                edit_bundle=edit_bundle,
                rng=jax.random.PRNGKey(0),  # seed-0 per edit (reference :381)
                return_attn_sums=want_sums,
                sampler=swap_cfg.get('sampler', cfg.get('sampler', 'ddim')),
            )
            attn_sums = None
            if want_sums:
                frames, attn_sums = frames
            results[key] = frames

            if conditions is not None and cfg.get('visualize_point'):
                from videoswap_tpu.utils.vis_util import overlay_points
                results[key + '_vispoint'] = overlay_points(
                    [f.copy() for f in frames], conditions)

            if cfg.get('visualize_attention') and save_dir is not None:
                self._dump_attention_maps(target_prompt, frames, key,
                                          save_dir, attn_sums=attn_sums,
                                          num_steps=steps)

            if lora_ctx is not None:
                from videoswap_tpu.edlora import restore_pipeline
                restore_pipeline(self, lora_ctx)
        return results
