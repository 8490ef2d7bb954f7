"""shard_map wrappers for view-sharded (joint multi-view) model execution.

Convention: multi-view batches are (B, V, ...) — axis 0 sharded over the
``data`` mesh axis, axis 1 over ``view``. Inside the shard_map body the local
(B_l, V_l, ...) block is flattened to the model's flat row convention
(row = b * V_l + v, views fastest) so every per-row op (convs, norms,
cross-attention, adapters, FiLM) is purely local; the ONLY cross-device
communication is the ring K/V rotation inside joint self-attention
(kernels/ring_attention.py) plus the gradient psum XLA inserts for the
replicated params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _flatten_bv(x):
    return x.reshape((-1,) + x.shape[2:])


def _bv_spec(ndim: int) -> P:
    return P("data", "view", *([None] * (ndim - 2)))


def sharded_denoise_fn(
    mvd_unet,
    mesh: Mesh,
    with_conditioning: bool = True,
) -> Callable:
    """Build a jitted, view-sharded denoise function.

    Returns fn(params, sample_bv, t, text_bv, film, ref_features, ref_scale)
    where sample_bv is (B, V, h, w, 4), text_bv is (B, V, 77, D), film values
    are (B, V, C) pairs and ref features are (B, V, S, C). The wrapped module
    must have ``cfg.unet.view_axis == "view"`` and ``cfg.unet.num_views == V``.
    """

    def body(params, sample, t, text, film, ref_features, ref_scale):
        sample = _flatten_bv(sample)
        text = _flatten_bv(text)
        # tree_map handles both raw (B, V, S, C) features and the
        # precomputed-K/V form ({name: {"self"/"cross": (k, v)}})
        film = jax.tree_util.tree_map(_flatten_bv, film)
        ref_features = jax.tree_util.tree_map(_flatten_bv, ref_features)
        out = mvd_unet.apply(
            params, sample, t, text, film, ref_features, ref_scale,
            method=mvd_unet.denoise,
        )
        return out.reshape((-1, mvd_unet.cfg.unet.num_views // mesh.shape["view"]) + out.shape[1:])

    def specs_for(tree):
        return jax.tree_util.tree_map(lambda x: _bv_spec(jnp.ndim(x)), tree)

    def fn(params, sample, t, text, film=None, ref_features=None, ref_scale=None):
        in_specs = (
            P(),  # params replicated
            _bv_spec(sample.ndim),
            P(),
            _bv_spec(text.ndim),
            specs_for(film),
            specs_for(ref_features),
            P(),
        )
        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=_bv_spec(sample.ndim),
            check_vma=False,
        )
        return mapped(params, sample, t, text, film, ref_features, ref_scale)

    return fn


def sharded_denoise_cache_fns(mvd_unet, mesh: Mesh):
    """Cache-returning / cache-consuming variants of ``sharded_denoise_fn``
    for encoder-propagation fast sampling (pipeline ``encoder_reuse=k``).

    The encoder cache pytree keeps the model's flat-row convention with
    axis 0 sharded over ``(data, view)`` — it only ever flows from one
    shard_map call into the next within the same traced group, so the
    global layout just needs to be self-consistent.

    Returns ``(with_cache, cached)``:
      * ``with_cache(params, sample_bv, t, text_bv, film, ref, scale)``
        -> ``(pred_bv, cache)``
      * ``cached(params, cache, sample_bv, t, text_bv, film, ref, scale)``
        -> ``pred_bv`` (the down path is skipped; sample is shape-only)
    """
    V_local = mvd_unet.cfg.unet.num_views // mesh.shape["view"]
    cache_spec = P(("data", "view"))  # prefix spec, axis 0 over both axes

    def body_with_cache(params, sample, t, text, film, ref_features, ref_scale):
        sample = _flatten_bv(sample)
        text = _flatten_bv(text)
        film = jax.tree_util.tree_map(_flatten_bv, film)
        ref_features = jax.tree_util.tree_map(_flatten_bv, ref_features)
        out, cache = mvd_unet.apply(
            params, sample, t, text, film, ref_features, ref_scale,
            return_encoder_cache=True, method=mvd_unet.denoise,
        )
        return out.reshape((-1, V_local) + out.shape[1:]), cache

    def body_cached(params, cache, sample, t, text, film, ref_features, ref_scale):
        sample = _flatten_bv(sample)
        text = _flatten_bv(text)
        film = jax.tree_util.tree_map(_flatten_bv, film)
        ref_features = jax.tree_util.tree_map(_flatten_bv, ref_features)
        out = mvd_unet.apply(
            params, sample, t, text, film, ref_features, ref_scale,
            cached_encoder=cache, method=mvd_unet.denoise,
        )
        return out.reshape((-1, V_local) + out.shape[1:])

    def specs_for(tree):
        return jax.tree_util.tree_map(lambda x: _bv_spec(jnp.ndim(x)), tree)

    def with_cache(params, sample, t, text, film=None, ref_features=None,
                   ref_scale=None):
        in_specs = (
            P(), _bv_spec(sample.ndim), P(), _bv_spec(text.ndim),
            specs_for(film), specs_for(ref_features), P(),
        )
        mapped = shard_map(
            body_with_cache, mesh=mesh, in_specs=in_specs,
            out_specs=(_bv_spec(sample.ndim), cache_spec), check_vma=False,
        )
        return mapped(params, sample, t, text, film, ref_features, ref_scale)

    def cached(params, cache, sample, t, text, film=None, ref_features=None,
               ref_scale=None):
        in_specs = (
            P(), cache_spec, _bv_spec(sample.ndim), P(), _bv_spec(text.ndim),
            specs_for(film), specs_for(ref_features), P(),
        )
        mapped = shard_map(
            body_cached, mesh=mesh, in_specs=in_specs,
            out_specs=_bv_spec(sample.ndim), check_vma=False,
        )
        return mapped(params, cache, sample, t, text, film, ref_features, ref_scale)

    return with_cache, cached


def make_sharded_sampler(
    mvd_unet,
    mesh: Mesh,
    schedule,
    num_inference_steps: int,
    sampler: str = "ddpm",
):
    """View-sharded multi-view sampling loop (BASELINE config 4: N-view
    joint denoising with the view axis sharded; ring cross-view attention
    inside every step).

    Returns fn(params, latents_bv, text_bv, film_bv, ref_bv, ref_scale, rng)
    -> final latents (B, V, h, w, 4). Conditioning is precomputed (e.g. by
    ``MultiViewUNet.prepare_conditioning`` on replicated data and reshaped
    to (B, V, ...)). No CFG inside (multi-view generation runs guidance 1.0
    in the reference's validation path, training.py:329-342)."""
    from .diffusion import ddim_step, ddpm_step, inference_timesteps

    denoise = sharded_denoise_fn(mvd_unet, mesh)
    ts_grid = jnp.asarray(inference_timesteps(schedule, num_inference_steps))

    def fn(params, latents, text, film=None, ref_features=None, ref_scale=None,
           rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def body(carry, t):
            lat, rng = carry
            rng, step_rng = jax.random.split(rng)
            pred = denoise(params, lat, t, text, film, ref_features, ref_scale)
            if sampler == "ddim":
                lat = ddim_step(schedule, pred, t, lat, num_inference_steps)
            else:
                lat = ddpm_step(schedule, pred, t, lat, step_rng, num_inference_steps)
            return (lat, rng), None

        (lat, _), _ = jax.lax.scan(body, (latents, rng), ts_grid)
        return lat

    return jax.jit(fn)


def model_parallel_shardings(params, mesh: Mesh, min_dim: int = 1024):
    """Tensor-parallel parameter shardings over the ``model`` mesh axis.

    The UNet's widest matmuls (1280-wide attention projections, 5120-wide
    GEGLU FFNs, the 1024-dim text cross-attention K/V) get their output
    dimension sharded; GSPMD then partitions the matmuls and inserts the
    collectives. Optional at SD2.1 scale (fits one chip — SURVEY §2.4) but
    wired for wider variants: pass the resulting shardings as the params
    in_sharding of any jitted step.
    """
    n = mesh.shape["model"]

    def spec_for(x):
        if (
            n > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % n == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_params_model_parallel(params, mesh: Mesh, min_dim: int = 1024):
    shardings = model_parallel_shardings(params, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def for_view_sharding(model_cfg, num_views: int, view_devices: int):
    """Return a ModelConfig whose UNet runs joint attention over
    ``num_views`` with the view axis sharded over ``view_devices`` devices."""
    unet = dataclasses.replace(
        model_cfg.unet,
        num_views=num_views,
        view_axis="view" if view_devices > 1 else None,
    )
    return dataclasses.replace(model_cfg, unet=unet)
