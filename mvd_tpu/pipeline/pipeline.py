"""MVD generation pipeline: text -> multi-view images, fully jit-compiled.

TPU-native rebuild of reference src/models/pipeline.py:10-186 (an eager
Python loop over ``scheduler.step``) as ONE compiled program:

  * CLIP text encode, CFG concat (uncond first — pipeline.py:79),
  * VAE-encode of the source view (+ scaling factor, pipeline.py:115-116),
  * step-invariant conditioning (camera FiLM + adapter features) hoisted out
    of the loop — the reference recomputes the frozen feature-extractor UNet
    at every step,
  * the denoising loop as ``lax.scan`` over the timestep grid with the DDPM
    (ancestral, fixed_small) or DDIM step, CFG combine inside the scan,
  * VAE decode + (x/2+0.5).clamp(0,1) (pipeline.py:171-176).

One compiled function per static shape signature (batch, resolution, steps,
guidance on/off, conditioning on/off), cached; everything else is traced, so
ref_scale/guidance_scale sweeps do not recompile.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..diffusion import (
    NoiseSchedule,
    SAMPLERS,
    ddim_inverse_step,
    ddim_step,
    ddpm_step,
    dpmpp_2m_init,
    dpmpp_2m_step,
    inference_timesteps,
    make_shifted_schedule,
)
from ..nn import AutoencoderKL, CLIPTextEncoder, MultiViewUNet
from ..data.tokenizer import load_tokenizer


def _signed_range(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] iff the data is in [0,1] (reference pipeline.py:107),
    decided with TRACED min/max so device-resident inputs never bounce
    through the host (a host probe costs a full tunnel round-trip)."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    return jnp.where((lo >= 0) & (hi <= 1), 2 * img - 1, img)


def build_schedule(cfg: ModelConfig) -> NoiseSchedule:
    s = cfg.scheduler
    base = NoiseSchedule.create(
        num_train_timesteps=s.num_train_timesteps,
        beta_schedule=s.beta_schedule,
        beta_start=s.beta_start,
        beta_end=s.beta_end,
        prediction_type=s.prediction_type,
        steps_offset=s.steps_offset,
        timestep_spacing=s.timestep_spacing,
    )
    if s.shift_mode and s.shift_mode != "none":
        return make_shifted_schedule(base, s.shift_scale, s.shift_mode)
    return base


class MVDPipeline:
    """Holds modules + params + schedule; callable like the reference
    pipeline (same argument names where they exist)."""

    def __init__(
        self,
        config: ModelConfig,
        params: Dict[str, Any],
        tokenizer=None,
        schedule: Optional[NoiseSchedule] = None,
        mesh=None,
    ):
        self.config = config
        self.params = params
        dtype = jnp.dtype(config.dtype)
        self.mvd_unet = MultiViewUNet(config)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.text_encoder = CLIPTextEncoder(config.text_encoder, dtype=dtype)
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=config.text_encoder.vocab_size,
            max_length=config.text_encoder.max_length,
        )
        self.schedule = schedule if schedule is not None else build_schedule(config)
        # view-sharded generation (BASELINE config 4): when the config's UNet
        # runs joint cross-view attention with the view axis sharded
        # (view_axis == "view") and a mesh is provided, __call__ routes the
        # denoise loop through shard_map + ring attention. The step-invariant
        # conditioning is computed by an unsharded twin (same params — the
        # module structure is view-axis independent).
        self.mesh = mesh
        if config.unet.view_axis is not None:
            local_cfg = dataclasses.replace(
                config, unet=dataclasses.replace(config.unet, view_axis=None)
            )
            self._local_unet = MultiViewUNet(local_cfg)
        else:
            self._local_unet = self.mvd_unet
        self._jit_cache: Dict[Any, Any] = {}
        self._compute_params_cache: Optional[Tuple[Any, Any]] = None

    @property
    def compute_params(self):
        """Params with the matmul/conv weights pre-cast to the compute dtype.

        Under bf16 the per-use ``f32 -> bf16`` weight converts re-run on
        EVERY step of the denoise scan (XLA does not hoist the large casts
        out of the loop): profiled 2.3 ms/step of convert_element_type at
        4-view 512² (~4% of the step). Casting once off the f32 masters is
        bit-identical — the modules already compute in bf16 — and norm-scoped
        params (GroupNorm/LayerNorm scale/bias, consumed in f32 statistics
        math) are left in f32. The cache invalidates when ``self.params`` is
        rebound (checkpoint load, trainer validation)."""
        if jnp.dtype(self.config.dtype) == jnp.float32:
            return self.params
        if (
            self._compute_params_cache is None
            or self._compute_params_cache[0] is not self.params
        ):
            dtype = jnp.dtype(self.config.dtype)

            def cast(path, x):
                name = "/".join(str(p) for p in path).lower()
                if "norm" in name or x.dtype != jnp.float32:
                    return x
                return x.astype(dtype)

            from flax.traverse_util import flatten_dict, unflatten_dict

            flat = flatten_dict(self.params)
            casted = unflatten_dict({k: cast(k, v) for k, v in flat.items()})
            self._compute_params_cache = (self.params, casted)
        return self._compute_params_cache[1]

    @property
    def view_sharded(self) -> bool:
        return (
            self.mesh is not None
            and self.config.unet.view_axis is not None
            and self.mesh.shape.get(self.config.unet.view_axis, 1) > 1
        )

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, config: ModelConfig, rng: jax.Array, tokenizer=None, mesh=None):
        """Random-init all params (no pretrained weights in this env; use
        checkpoint/torch_convert.py to load reference weights)."""
        k1, k2, k3 = jax.random.split(rng, 3)
        hw = config.unet.sample_size
        # init outside shard_map: strip the collective view axis (the param
        # structure is independent of it)
        init_config = config
        if config.unet.view_axis is not None:
            init_config = dataclasses.replace(
                config, unet=dataclasses.replace(config.unet, view_axis=None)
            )
        mvd = MultiViewUNet(init_config)
        nb = max(1, config.unet.num_views)  # joint attention needs B % V == 0
        sample = jnp.zeros((nb, hw, hw, config.unet.in_channels))
        ctx = jnp.zeros((nb, config.text_encoder.max_length, config.unet.cross_attention_dim))
        cams = jnp.tile(jnp.eye(4)[None], (nb, 1, 1))
        # jit the inits: unjitted tracing dispatches thousands of tiny ops,
        # which is pathological on remote/tunneled device backends
        mvd_params = jax.jit(mvd.init)(
            k1,
            sample,
            jnp.zeros((), jnp.int32),
            ctx,
            source_camera=cams if config.use_camera_conditioning else None,
            target_camera=cams if config.use_camera_conditioning else None,
            source_image_latents=sample if config.use_image_conditioning else None,
        )
        vae = AutoencoderKL(config.vae)
        img_hw = min(config.vae.sample_size, 64)
        vae_params = jax.jit(vae.init)(
            k2, jnp.zeros((1, img_hw, img_hw, config.vae.in_channels))
        )
        te = CLIPTextEncoder(config.text_encoder)
        te_params = jax.jit(te.init)(
            k3, jnp.zeros((1, config.text_encoder.max_length), jnp.int32)
        )
        if config.use_image_conditioning and config.adapter_init_from_frozen:
            from ..nn.adapter_init import init_adapters_from_frozen

            mvd_params = init_adapters_from_frozen(mvd_params)
        params = {"mvd": mvd_params, "vae": vae_params, "text_encoder": te_params}
        return cls(config, params, tokenizer, mesh=mesh)

    # ------------------------------------------------------------------
    def encode_text(self, prompts: Union[str, List[str]]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(prompts))
        return self.text_encoder.apply(self.params["text_encoder"], ids)

    def vae_encode(self, images: jnp.ndarray, rng=None, sample=True) -> jnp.ndarray:
        """[-1,1] NHWC images -> scaled latents (x scaling_factor)."""
        z = self.vae.apply(self.params["vae"], images, rng, sample, method=self.vae.encode)
        return z * self.config.vae.scaling_factor

    def vae_decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """scaled latents -> [-1,1]-ish NHWC images."""
        z = latents / self.config.vae.scaling_factor
        return self.vae.apply(self.params["vae"], z, method=self.vae.decode)

    # ------------------------------------------------------------------
    def _encode_source(self, params, src_images, enc_rng, B):
        """VAE-encode the UNIQUE source images and tile the latent-
        distribution moments up to the generation batch.

        Identical in distribution to encoding a pre-tiled batch (the
        reference repeats the source image to batch size before encoding,
        pipeline.py:101-117; the per-element posterior depends only on the
        input) at 1/tile the encoder cost — at 4-view 512² this cuts ~45 ms
        of redundant encoder work per call. Per-view sample noise stays
        independent (drawn at full batch B)."""
        mean, logvar = self.vae.apply(
            params["vae"], _signed_range(src_images),
            method=self.vae.encode_moments,
        )
        n = src_images.shape[0]
        if n != B:
            reps = (B // n, 1, 1, 1)
            mean, logvar = jnp.tile(mean, reps), jnp.tile(logvar, reps)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(enc_rng, mean.shape, dtype=mean.dtype)
        return z * self.config.vae.scaling_factor

    def _generate_fn(self, key):
        """Build (and cache) the jitted end-to-end sampler for one static
        signature."""
        if key in self._jit_cache:
            return self._jit_cache[key]
        (B, lat_h, lat_w, steps, do_cfg, has_img, has_cam, sampler, gen_latents,
         enc_reuse) = key
        schedule = self.schedule
        ts_grid = jnp.asarray(inference_timesteps(schedule, steps))
        cfgm = self.config

        if self.view_sharded:
            jitted = self._build_sharded_generate(key)
            self._jit_cache[key] = jitted
            return jitted

        def fn(params, ids, neg_ids, latents, src_images, src_cam, tgt_cam,
               guidance_scale, ref_scale, rng):
            rng, lat_rng = jax.random.split(rng)
            if gen_latents:
                latents = (
                    jax.random.normal(lat_rng, (B, lat_h, lat_w, 4), jnp.float32)
                    * schedule.init_noise_sigma
                )
            text = self.text_encoder.apply(params["text_encoder"], ids)
            if do_cfg:
                uncond = self.text_encoder.apply(params["text_encoder"], neg_ids)
                # uncond first (reference pipeline.py:79, 156-158)
                embeds = jnp.concatenate([uncond, text], axis=0)
            else:
                embeds = text

            src_latents = None
            if has_img:
                rng, enc_rng = jax.random.split(rng)
                src_latents = self._encode_source(params, src_images, enc_rng, B)

            film, ref_feats = self.mvd_unet.apply(
                params["mvd"],
                embeds,
                src_cam if has_cam else None,
                tgt_cam if has_cam else None,
                src_latents,
                cfg_batch=2 * B if do_cfg else B,
                precompute_kv=True,
                method=self.mvd_unet.prepare_conditioning,
            )

            def denoise_at(lat, t, cached=None, return_cache=False):
                inp = jnp.concatenate([lat, lat], 0) if do_cfg else lat
                return self.mvd_unet.apply(
                    params["mvd"], inp, t, embeds, film, ref_feats, ref_scale,
                    cached_encoder=cached, return_encoder_cache=return_cache,
                    method=self.mvd_unet.denoise,
                )

            def sched_step(pred, t, lat, step_rng, sstate):
                if do_cfg:
                    un, co = jnp.split(pred, 2, axis=0)
                    pred = un + guidance_scale * (co - un)
                if sampler == "ddim":
                    return ddim_step(schedule, pred, t, lat, steps), sstate
                if sampler == "dpmpp_2m":
                    return dpmpp_2m_step(schedule, pred, t, lat, sstate, steps)
                return ddpm_step(schedule, pred, t, lat, step_rng, steps), sstate

            # multistep sampler memory, threaded explicitly through the scan
            # carry (dpmpp_2m keeps the previous x0 prediction; the
            # single-step samplers carry an empty placeholder)
            sstate0 = (
                dpmpp_2m_init(latents)
                if sampler == "dpmpp_2m"
                else jnp.zeros((), jnp.float32)
            )

            def body(carry, t):
                lat, rng, st = carry
                rng, step_rng = jax.random.split(rng)
                lat, st = sched_step(denoise_at(lat, t), t, lat, step_rng, st)
                return (lat, rng, st), None

            if enc_reuse <= 1:
                (lat, _, _), _ = jax.lax.scan(body, (latents, rng, sstate0), ts_grid)
            else:
                # encoder propagation ("Faster Diffusion", arXiv 2312.09608):
                # scan over groups of ``enc_reuse`` steps — the group's first
                # (key) step runs the full UNet and returns the down-path
                # cache, the remaining steps run decoder-only from that
                # cache. Any remainder steps run the exact full body.
                k = enc_reuse
                n_main = (steps // k) * k
                main_grid = ts_grid[:n_main].reshape(-1, k)
                tail_grid = ts_grid[n_main:]

                def group_body(carry, ts_k):
                    lat, rng, st = carry
                    rng, r0 = jax.random.split(rng)
                    pred, cache = denoise_at(lat, ts_k[0], return_cache=True)
                    lat, st = sched_step(pred, ts_k[0], lat, r0, st)
                    for i in range(1, k):
                        rng, ri = jax.random.split(rng)
                        pred = denoise_at(lat, ts_k[i], cached=cache)
                        lat, st = sched_step(pred, ts_k[i], lat, ri, st)
                    return (lat, rng, st), None

                (lat, rng, sstate0), _ = jax.lax.scan(
                    group_body, (latents, rng, sstate0), main_grid
                )
                if tail_grid.shape[0]:
                    (lat, _, _), _ = jax.lax.scan(
                        body, (lat, rng, sstate0), tail_grid
                    )
            img = self.vae.apply(
                params["vae"], lat / cfgm.vae.scaling_factor, method=self.vae.decode
            )
            img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return img

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def _build_sharded_generate(self, key):
        """View-sharded end-to-end sampler (BASELINE config 4): N-view joint
        denoising with the view axis sharded over the mesh, ring cross-view
        attention inside every step (reference training.py:300-343 runs this
        generation unsharded, guidance 1.0). Conditioning is prepared by the
        unsharded twin (per-row ops, GSPMD-partitioned), only the denoise
        loop runs under shard_map."""
        from ..parallel import sharded_denoise_cache_fns, sharded_denoise_fn

        (B, lat_h, lat_w, steps, do_cfg, has_img, has_cam, sampler, gen_latents,
         enc_reuse) = key
        schedule = self.schedule
        ts_grid = jnp.asarray(inference_timesteps(schedule, steps))
        cfgm = self.config
        V = cfgm.unet.num_views
        if B % V:
            raise ValueError(f"view-sharded generation needs batch % num_views == 0, got {B} % {V}")
        # CFG doubles the batch; B % V == 0 keeps the uncond/cond halves on
        # whole view-groups, so joint attention never mixes them (the
        # reference's multi-view generation runs guidance 1.0,
        # training.py:329-342 — CFG here is a rebuild extra)
        BB = 2 * B if do_cfg else B
        groups = BB // V
        if groups % self.mesh.shape["data"]:
            raise ValueError(
                f"view-sharded generation needs (batch x {2 if do_cfg else 1}"
                f" [CFG]) / num_views = {groups} view-groups divisible by the"
                f" data mesh axis ({self.mesh.shape['data']})"
            )
        denoise = sharded_denoise_fn(self.mvd_unet, self.mesh)
        if enc_reuse > 1:
            denoise_with_cache, denoise_cached = sharded_denoise_cache_fns(
                self.mvd_unet, self.mesh
            )

        def fn(params, ids, neg_ids, latents, src_images, src_cam, tgt_cam,
               guidance_scale, ref_scale, rng):
            rng, lat_rng = jax.random.split(rng)
            if gen_latents:
                latents = (
                    jax.random.normal(lat_rng, (B, lat_h, lat_w, 4), jnp.float32)
                    * schedule.init_noise_sigma
                )
            text = self.text_encoder.apply(params["text_encoder"], ids)
            if do_cfg:
                uncond = self.text_encoder.apply(params["text_encoder"], neg_ids)
                # uncond first (reference pipeline.py:79, 156-158)
                embeds = jnp.concatenate([uncond, text], axis=0)
            else:
                embeds = text

            src_latents = None
            if has_img:
                rng, enc_rng = jax.random.split(rng)
                src_latents = self._encode_source(params, src_images, enc_rng, B)

            film, ref_feats = self._local_unet.apply(
                params["mvd"],
                embeds,
                src_cam if has_cam else None,
                tgt_cam if has_cam else None,
                src_latents,
                cfg_batch=BB,
                precompute_kv=True,
                method=self._local_unet.prepare_conditioning,
            )
            bv = lambda x: x.reshape((B // V, V) + x.shape[1:])
            bbv = lambda x: x.reshape((BB // V, V) + x.shape[1:])
            film_bv = jax.tree_util.tree_map(bbv, film)
            ref_bv = jax.tree_util.tree_map(bbv, ref_feats)
            text_bv = bbv(embeds)
            # latents carry B rows; the CFG duplication happens on the
            # group axis right before each denoise call
            dup = (lambda x: jnp.concatenate([x, x], axis=0)) if do_cfg else (lambda x: x)

            sstate0 = (
                dpmpp_2m_init(latents)
                if sampler == "dpmpp_2m"
                else jnp.zeros((), jnp.float32)
            )

            # scheduler step on the flat (B, ...) view so the DDPM noise
            # draw is bit-identical to the unsharded pipeline (the merged
            # (data x view) axis stays sharded under GSPMD)
            flatB = lambda x: x.reshape((B,) + x.shape[2:])

            def guide(pred_bv):
                p = pred_bv.reshape((BB,) + pred_bv.shape[2:])
                if do_cfg:
                    un, co = jnp.split(p, 2, axis=0)
                    p = un + guidance_scale * (co - un)
                return p  # (B, ...)

            def sched_step(pred_bv, t, lat, step_rng, st):
                pred = guide(pred_bv)
                if sampler == "ddim":
                    return ddim_step(schedule, pred, t, flatB(lat), steps), st
                if sampler == "dpmpp_2m":
                    return dpmpp_2m_step(
                        schedule, pred, t, flatB(lat), st, steps
                    )
                return ddpm_step(
                    schedule, pred, t, flatB(lat), step_rng, steps
                ), st

            def body(carry, t):
                lat, rng, st = carry
                rng, step_rng = jax.random.split(rng)
                pred = denoise(
                    params["mvd"], dup(lat), t, text_bv, film_bv, ref_bv, ref_scale
                )
                nxt, st = sched_step(pred, t, lat, step_rng, st)
                return (bv(nxt), rng, st), None

            if enc_reuse <= 1:
                (lat, _, _), _ = jax.lax.scan(
                    body, (bv(latents), rng, sstate0), ts_grid
                )
            else:
                # encoder propagation under view sharding: same grouping as
                # the unsharded path; the key step's down-path cache flows
                # from one shard_map call into the next within the group
                k = enc_reuse
                n_main = (steps // k) * k
                main_grid = ts_grid[:n_main].reshape(-1, k)
                tail_grid = ts_grid[n_main:]

                def group_body(carry, ts_k):
                    lat, rng, st = carry
                    rng, r0 = jax.random.split(rng)
                    pred, cache = denoise_with_cache(
                        params["mvd"], dup(lat), ts_k[0], text_bv, film_bv,
                        ref_bv, ref_scale,
                    )
                    nxt, st = sched_step(pred, ts_k[0], lat, r0, st)
                    lat = bv(nxt)
                    for i in range(1, k):
                        rng, ri = jax.random.split(rng)
                        pred = denoise_cached(
                            params["mvd"], cache, dup(lat), ts_k[i], text_bv,
                            film_bv, ref_bv, ref_scale,
                        )
                        nxt, st = sched_step(pred, ts_k[i], lat, ri, st)
                        lat = bv(nxt)
                    return (lat, rng, st), None

                (lat, rng, sstate0), _ = jax.lax.scan(
                    group_body, (bv(latents), rng, sstate0), main_grid
                )
                if tail_grid.shape[0]:
                    (lat, _, _), _ = jax.lax.scan(
                        body, (lat, rng, sstate0), tail_grid
                    )
            lat = lat.reshape((B,) + lat.shape[2:])
            img = self.vae.apply(
                params["vae"], lat / cfgm.vae.scaling_factor, method=self.vae.decode
            )
            return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

        return jax.jit(fn)

    # ------------------------------------------------------------------
    def _invert_fn(self, key):
        """Build (and cache) the jitted DDIM-inversion program for one
        static signature: VAE mean-encode -> conditioning prep -> ascending
        `lax.scan` of ddim_inverse_step -> noised latents."""
        if key in self._jit_cache:
            return self._jit_cache[key]
        (_, B, lat_h, lat_w, steps, has_img, has_cam) = key
        schedule = self.schedule
        asc_grid = jnp.asarray(inference_timesteps(schedule, steps)[::-1].copy())

        def fn(params, ids, images, src_images, src_cam, tgt_cam, ref_scale):
            embeds = self.text_encoder.apply(params["text_encoder"], ids)
            # deterministic (mean-mode) VAE encode of the images to invert
            mean, _ = self.vae.apply(
                params["vae"], _signed_range(images), method=self.vae.encode_moments
            )
            latents = mean * self.config.vae.scaling_factor

            src_latents = None
            if has_img:
                s_mean, _ = self.vae.apply(
                    params["vae"], _signed_range(src_images),
                    method=self.vae.encode_moments,
                )
                s_lat = s_mean * self.config.vae.scaling_factor
                if s_lat.shape[0] != B:
                    s_lat = jnp.tile(s_lat, (B // s_lat.shape[0], 1, 1, 1))
                src_latents = s_lat

            film, ref_feats = self.mvd_unet.apply(
                params["mvd"],
                embeds,
                src_cam if has_cam else None,
                tgt_cam if has_cam else None,
                src_latents,
                cfg_batch=B,
                precompute_kv=True,
                method=self.mvd_unet.prepare_conditioning,
            )

            def body(lat, t):
                pred = self.mvd_unet.apply(
                    params["mvd"], lat, t, embeds, film, ref_feats, ref_scale,
                    method=self.mvd_unet.denoise,
                )
                return ddim_inverse_step(schedule, pred, t, lat, steps), None

            lat, _ = jax.lax.scan(body, latents, asc_grid)
            return lat

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def invert(
        self,
        images,
        prompt: Union[str, List[str], None] = None,
        num_inference_steps: int = 50,
        source_camera: Optional[np.ndarray] = None,
        target_camera: Optional[np.ndarray] = None,
        source_images: Optional[np.ndarray] = None,
        ref_scale: float = 0.1,
        output_type: str = "np",
    ):
        """DDIM inversion: map clean images ([0,1], NHWC) up the noise
        schedule to their initial latents, such that a deterministic DDIM
        resample with the same prompt/conditioning/step count approximately
        reconstructs the input (novel-view-synthesis-by-inversion workflows,
        arXiv 2508.10688; the reference has no inversion path). Deterministic:
        mean-mode VAE encode, no noise draws, guidance 1.0. Returns
        {"latents": (B, h/8, w/8, 4)} — feed back via ``pipe(latents=...,
        sampler="ddim", guidance_scale=1.0)``."""
        cfg = self.config
        if prompt is None:
            prompt = ""
        if isinstance(prompt, str):
            prompt = [prompt]

        images = np.asarray(images, np.float32) if not isinstance(images, jax.Array) else images
        if images.ndim == 3:
            images = images[None]
        B = images.shape[0]
        if len(prompt) == 1:
            prompt = prompt * B
        if len(prompt) != B:
            raise ValueError(f"{len(prompt)} prompts for {B} images")
        lat_h, lat_w = images.shape[1] // 8, images.shape[2] // 8

        ids = np.asarray(self.tokenizer(prompt))
        has_img = cfg.use_image_conditioning and source_images is not None
        has_cam = cfg.use_camera_conditioning and target_camera is not None

        src_images = np.zeros((1, images.shape[1], images.shape[2], 3), np.float32)
        if has_img:
            src = source_images
            if not isinstance(src, jax.Array):
                src = np.asarray(src, np.float32)
            if src.ndim == 3:
                src = src[None]
            if B % src.shape[0]:
                raise ValueError(
                    f"batch {B} is not a multiple of {src.shape[0]} source images"
                )
            src_images = src

        def prep_cam(c):
            c = np.asarray(c, np.float32)
            if c.ndim == 2:
                c = c[None]
            if c.shape[-2] == 3:
                pad = np.tile(np.array([0, 0, 0, 1], np.float32), (c.shape[0], 1, 1))
                c = np.concatenate([c, pad], axis=-2)
            if c.shape[0] < B:
                c = np.tile(c, (B // c.shape[0], 1, 1))
            return c

        eye = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        src_cam = prep_cam(source_camera) if has_cam else eye
        tgt_cam = prep_cam(target_camera) if has_cam else eye

        key = ("invert", B, lat_h, lat_w, num_inference_steps, has_img, has_cam)
        fn = self._invert_fn(key)
        latents = fn(
            self.compute_params,
            jnp.asarray(ids),
            images if isinstance(images, jax.Array) else jnp.asarray(images),
            src_images if isinstance(src_images, jax.Array) else jnp.asarray(src_images),
            jnp.asarray(src_cam),
            jnp.asarray(tgt_cam),
            jnp.float32(ref_scale),
        )
        if output_type == "np":
            latents = np.asarray(latents)
        return {"latents": latents}

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, List[str], None] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Union[str, List[str], None] = None,
        num_images_per_prompt: int = 1,
        latents: Optional[jnp.ndarray] = None,
        source_camera: Optional[np.ndarray] = None,
        target_camera: Optional[np.ndarray] = None,
        source_images: Optional[np.ndarray] = None,
        ref_scale: float = 0.1,
        seed: int = 0,
        rng: Optional[jax.Array] = None,
        output_type: str = "np",
        encoder_reuse: int = 1,
        sampler: Optional[str] = None,
    ):
        """Generate images. Returns dict with "images": (B, H, W, 3) in [0,1]
        (the reference returns the same range, pipeline.py:176).

        ``encoder_reuse=k`` (k > 1) enables encoder-propagation fast sampling
        ("Faster Diffusion", arXiv 2312.09608): within each group of k steps
        only the first runs the UNet down path; the rest reuse its cached
        skip/bottleneck activations and recompute the decoder only. This is
        an APPROXIMATION (outputs differ slightly from exact sampling) —
        default 1 keeps the exact reference-faithful trajectory.

        ``sampler`` overrides the config's scheduler.sampler per call:
        "ddpm" (ancestral, the reference's mode), "ddim", or "dpmpp_2m"
        (second-order DPM-Solver++ multistep — ~10 steps where DDIM needs
        20-50)."""
        cfg = self.config
        if prompt is None:
            prompt = ""
        if isinstance(prompt, str):
            prompt = [prompt]
        B = len(prompt) * num_images_per_prompt

        vae_scale = 8
        height = height or cfg.unet.sample_size * vae_scale
        width = width or cfg.unet.sample_size * vae_scale
        lat_h, lat_w = height // vae_scale, width // vae_scale

        if rng is None:
            rng = jax.random.PRNGKey(seed)

        ids = np.asarray(self.tokenizer(prompt))
        ids = np.repeat(ids, num_images_per_prompt, axis=0)
        # standard SD semantics: guidance > 1 turns CFG on, with an
        # empty-string uncond when no negative prompt is given (the reference
        # silently skips CFG without an explicit negative prompt —
        # pipeline.py:64-79; that quirk made `guidance_scale=7.5` alone a
        # no-op)
        do_cfg = guidance_scale > 1.0
        if do_cfg and negative_prompt is None:
            negative_prompt = ""
        if do_cfg:
            neg = negative_prompt if isinstance(negative_prompt, list) else [negative_prompt]
            if len(neg) == 1:
                neg = neg * len(prompt)
            neg_ids = np.repeat(np.asarray(self.tokenizer(neg)), num_images_per_prompt, 0)
        else:
            neg_ids = np.zeros_like(ids)

        # latents are drawn INSIDE the jitted fn (one fewer host dispatch per
        # call — each costs a tunnel round-trip) unless the caller provides
        # them explicitly
        gen_latents = latents is None
        if gen_latents:
            latents = np.zeros((1,), np.float32)  # ignored placeholder

        has_img = cfg.use_image_conditioning and source_images is not None
        has_cam = cfg.use_camera_conditioning and target_camera is not None

        # shape-only host logic: device-resident inputs are never pulled to
        # the host (the [0,1] range probe now runs traced, in _signed_range).
        # Source images stay UNIQUE here — the jitted fn encodes them once
        # and tiles the latent moments to B (_encode_source).
        src_images = np.zeros((1, height, width, 3), np.float32)
        if has_img:
            src = source_images
            if not isinstance(src, jax.Array):
                src = np.asarray(src, np.float32)
            if src.ndim == 3:
                src = src[None]
            if B % src.shape[0]:
                raise ValueError(
                    f"batch {B} is not a multiple of {src.shape[0]} source images"
                )
            src_images = src

        def prep_cam(c):
            c = np.asarray(c, np.float32)
            if c.ndim == 2:
                c = c[None]
            if c.shape[-2] == 3:  # [3,4] -> [4,4]
                pad = np.tile(np.array([0, 0, 0, 1], np.float32), (c.shape[0], 1, 1))
                c = np.concatenate([c, pad], axis=-2)
            if c.shape[0] < B:
                c = np.tile(c, (B // c.shape[0], 1, 1))
            return c

        src_cam = prep_cam(source_camera) if has_cam else np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        tgt_cam = prep_cam(target_camera) if has_cam else np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))

        if encoder_reuse < 1:
            raise ValueError(f"encoder_reuse must be >= 1, got {encoder_reuse}")
        sampler = sampler or cfg.scheduler.sampler
        if sampler not in SAMPLERS:
            raise ValueError(f"unknown sampler {sampler!r}; expected one of {SAMPLERS}")
        key = (
            B, lat_h, lat_w, num_inference_steps, do_cfg, has_img, has_cam,
            sampler, gen_latents, encoder_reuse,
        )
        fn = self._generate_fn(key)
        images = fn(
            self.compute_params,
            jnp.asarray(ids),
            jnp.asarray(neg_ids),
            latents,
            src_images if isinstance(src_images, jax.Array) else jnp.asarray(src_images),
            jnp.asarray(src_cam),
            jnp.asarray(tgt_cam),
            jnp.float32(guidance_scale),
            jnp.float32(ref_scale),
            rng,
        )
        if output_type == "np":
            images = np.asarray(images)
        return {"images": images}
