"""The jit-compiled training step (single- and multi-chip).

One compiled program per step, mirroring reference training.py:167-262:
  frozen text encode -> frozen VAE encode (source+target, sampled, x
  scaling_factor, training.py:173-197) -> noise + uniform timesteps ->
  add_noise on the SHIFTED schedule (training.py:48 picks up the shifted
  betas via the pipeline scheduler config) -> MultiViewUNet prediction ->
  Min-SNR-weighted v-prediction MSE -> masked AdamW update.

Parallelism:
  * default: batch (B, V, ...) flattened to rows, leading dim sharded over
    the ("data","view") mesh axes via jit in_shardings; params replicated;
    XLA inserts the gradient all-reduce over ICI (the DDP equivalent of
    reference train.py:175-186).
  * ``view_sharded``: the whole loss runs inside shard_map with the view
    axis sharded; joint cross-view attention uses the ring collective and
    gradients psum across the mesh. Requires cfg.unet.view_axis == "view".

Telemetry mirrors the reference's per-group gradient norms
(training.py:132-165, 557-701): camera_encoder, image_attention_processor
(adapters), down/mid/up modulators, plus the global grad norm.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..diffusion import NoiseSchedule, add_noise
from .losses import noise_loss
from .state import TrainState, trainable_mask

GRAD_GROUPS = {
    "camera_encoder": lambda parts: "camera_encoder" in parts
    and not any(p.startswith("mod_") for p in parts),
    "image_attention_processor": lambda parts: "adapter_self" in parts
    or "adapter_cross" in parts,
    "down_modulators": lambda parts: any(p.startswith("mod_down") for p in parts),
    "up_modulators": lambda parts: any(p.startswith("mod_up") for p in parts),
    "mid_modulators": lambda parts: any(
        p.startswith("mod_mid") or p.startswith("mod_output") for p in parts
    ),
}


def grad_group_samples(grads, k: int = 512) -> Dict[str, jnp.ndarray]:
    """Deterministic strided samples of raw per-group gradient values — the
    jit-stable equivalent of the reference's randomly sampled W&B gradient
    histograms (training.py:603-647). Each group contributes ~k values spread
    evenly across its leaves; the host logger bins them (wandb.Histogram /
    16-bin JSONL record) just as Lightning's wandb integration did. Keys are
    prefixed ``hist/`` so the loop routes them past the scalar-metric path."""
    flat = flatten_dict(grads)
    out = {}
    for name, pred in GRAD_GROUPS.items():
        leaves = [
            v.reshape(-1).astype(jnp.float32)
            for key, v in flat.items()
            if pred([str(p) for p in key]) and v.size > 0
        ]
        if not leaves:
            continue
        per = max(1, k // len(leaves))
        samples = [v[:: max(1, v.shape[0] // per)][:per] for v in leaves]
        out[f"hist/grad/{name}"] = jnp.concatenate(samples)
    return out


def grad_group_norms(grads) -> Dict[str, jnp.ndarray]:
    """Per-group gradient norms + max-abs (the reference's parameter-group
    gradient telemetry, training.py:557-701; raw-value histograms come from
    ``grad_group_samples``).  ``grads`` is the TRAINABLE partition only, so
    ``grad_norm/total`` covers exactly the params the optimizer moves —
    the same population Lightning's grad-norm hook sees (requires_grad
    params, reference training.py:529-555)."""
    flat = flatten_dict(grads)
    out = {}
    for name, pred in GRAD_GROUPS.items():
        leaves = [v for k, v in flat.items() if pred([str(p) for p in k])]
        if leaves:
            sq = sum(jnp.sum(jnp.square(v.astype(jnp.float32))) for v in leaves)
            out[f"grad_norm/{name}"] = jnp.sqrt(sq)
            out[f"grad_max/{name}"] = jnp.max(
                jnp.stack([jnp.max(jnp.abs(v)) for v in leaves])
            )
        else:
            out[f"grad_norm/{name}"] = jnp.zeros(())
            out[f"grad_max/{name}"] = jnp.zeros(())
    total = sum(jnp.sum(jnp.square(v.astype(jnp.float32))) for v in flat.values())
    out["grad_norm/total"] = jnp.sqrt(total)
    return out


def film_stats(film) -> Dict[str, jnp.ndarray]:
    """Camera-modulation statistics (reference camera_encoder.py:230-253 /
    training.py:703-717): per-modulator scale/shift mean and std."""
    out = {}
    for name, (scale, shift) in film.items():
        out[f"modulation/{name}/scale_mean"] = scale.mean()
        out[f"modulation/{name}/scale_std"] = scale.std()
        out[f"modulation/{name}/shift_mean"] = shift.mean()
        out[f"modulation/{name}/shift_std"] = shift.std()
    return out


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def split_params(params, mask):
    """Partition ``params`` into (trainable, frozen) sub-trees by the
    ``trainable_mask`` labels.  The train step differentiates ONLY the
    trainable partition — the functional equivalent of the reference's
    ``requires_grad=False`` freeze policy (training.py:53-93).  Taking
    grads w.r.t. the full tree instead would force XLA to emit
    weight-gradient computations for every frozen conv/matmul AND a full
    backward pass through the frozen feature-extractor UNet (whose only
    gradient consumers would be those dead frozen-weight grads)."""
    fp, fm = flatten_dict(params), flatten_dict(mask)
    t = {k: v for k, v in fp.items() if fm[k] == "trainable"}
    f = {k: v for k, v in fp.items() if fm[k] != "trainable"}
    return unflatten_dict(t), unflatten_dict(f)


def merge_params(a, b):
    """Inverse of :func:`split_params` (disjoint key sets)."""
    return unflatten_dict({**flatten_dict(a), **flatten_dict(b)})


def _sample_from_moments(moments, rng, sf):
    """Latent sample from cached posterior moments (N, 2, h, w, 4) — the
    same ``mean + exp(0.5·logvar)·eps`` draw ``AutoencoderKL.encode`` makes,
    with eps at the same shape/key; a float32 cache matches the pixel path
    to f32 ulp on the moments (data/latent_cache.py)."""
    mean, logvar = moments[:, 0], moments[:, 1]
    std = jnp.exp(0.5 * logvar)
    return (mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)) * sf


def make_loss_fn(
    pipe,
    schedule: NoiseSchedule,
    cfg: TrainConfig,
    with_recon_metrics: bool = False,
    image_metric_fns: Optional[Dict[str, Any]] = None,
    source_repeat: int = 1,
):
    """Local (per-shard) loss over a flat-row batch.

    ``with_recon_metrics`` additionally computes the no-grad reconstruction
    metric tower (x0-hat latent/pixel recon + SSIM — reference
    losses.py:209-261) from the same forward pass; the Trainer calls this
    variant every ``metrics_log_interval`` steps (training.py:250-255).
    ``image_metric_fns`` maps metric names to fns(img_hat, img_tgt) -> scalar
    for optional tower metrics (perceptual/CLIP) when weights exist.

    ``source_repeat`` = how many consecutive flat rows share one source view
    (the group loader's (B, V) layout flattens group-major,
    data/objaverse.py:_load_group): the source encoder then runs over the
    UNIQUE rows only and the posterior moments are tiled back — numerically
    equal to the naive path: the sampling eps is drawn with the same key and
    shape, and the moments match to f32 ulp (the encoder runs at batch N/V
    vs N, so XLA fuses differently; test_unique_source_encode_parity pins
    rtol=1e-6). The pipeline's moment-tiling trick
    (pipeline.py:_encode_source) applied to training.

    Batches may carry pixels ({source,target}_image) or cached latent
    posterior moments ({source,target}_moments, data/latent_cache.py) — the
    latter skip the frozen VAE encoder entirely (the reference re-encodes
    per step, training.py:173-177)."""
    cfgm = pipe.config
    sf = cfgm.vae.scaling_factor

    def encode_source(frozen, batch, r_vs):
        if "source_moments" in batch:
            return _sample_from_moments(batch["source_moments"], r_vs, sf)
        px = batch["source_image"]
        if source_repeat > 1:
            mean, logvar = pipe.vae.apply(
                frozen["vae"], px[::source_repeat], method=pipe.vae.encode_moments
            )
            mean = jnp.repeat(mean, source_repeat, axis=0)
            logvar = jnp.repeat(logvar, source_repeat, axis=0)
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(r_vs, mean.shape, dtype=mean.dtype)
            return (mean + std * eps) * sf
        return (
            pipe.vae.apply(frozen["vae"], px, r_vs, True, method=pipe.vae.encode)
            * sf
        )

    def loss_fn(params, frozen, batch, rng):
        # batch entries are flat rows (N, ...)
        ids = batch["input_ids"]
        N = ids.shape[0]
        r_noise, r_t, r_vs, r_vt = jax.random.split(rng, 4)

        text = pipe.text_encoder.apply(frozen["text_encoder"], ids)
        text = jax.lax.stop_gradient(text)

        src_lat = encode_source(frozen, batch, r_vs)
        if "target_moments" in batch:
            tgt_lat = _sample_from_moments(batch["target_moments"], r_vt, sf)
        else:
            tgt_lat = (
                pipe.vae.apply(
                    frozen["vae"], batch["target_image"], r_vt, True,
                    method=pipe.vae.encode,
                )
                * sf
            )
        src_lat = jax.lax.stop_gradient(src_lat)
        tgt_lat = jax.lax.stop_gradient(tgt_lat)

        noise = jax.random.normal(r_noise, tgt_lat.shape, jnp.float32)
        t = jax.random.randint(r_t, (N,), 0, schedule.num_train_timesteps)
        noisy = add_noise(schedule, tgt_lat, noise, t)

        pred = pipe.mvd_unet.apply(
            params,
            noisy,
            t,
            text,
            source_camera=batch.get("source_camera"),
            target_camera=batch.get("target_camera"),
            source_image_latents=src_lat if cfgm.use_image_conditioning else None,
        )
        extra_metrics = {}
        if cfgm.use_camera_conditioning and batch.get("target_camera") is not None:
            _, film = pipe.mvd_unet.apply(
                params,
                jax.lax.stop_gradient(batch["source_camera"]),
                jax.lax.stop_gradient(batch["target_camera"]),
                method=lambda mdl, sc, tc: mdl.camera_encoder(sc, tc),
            )
            extra_metrics = jax.tree_util.tree_map(
                jax.lax.stop_gradient, film_stats(film)
            )
        ld = noise_loss(
            schedule,
            pred,
            noise,
            tgt_lat,
            t,
            snr_gamma=cfg.loss.snr_gamma,
            use_snr=cfg.loss.use_snr_loss,
            weighting=cfg.loss.weighting,
        )
        if cfg.loss.feature_matching_weight > 0.0:
            # Auxiliary feature-matching term (BASELINE config 5): run the
            # frozen UNet feature extractor over the differentiable x0-hat
            # and the (stop-gradient) target latents and match per-block
            # activations (train/losses.py:feature_matching_loss). The same
            # frozen tower that conditions the adapters doubles as the
            # feature-matching network.
            from ..diffusion import pred_original_sample
            from .losses import feature_matching_loss

            x0_hat = pred_original_sample(schedule, pred, noisy, t)
            feats_pred = pipe.mvd_unet.apply(
                params, x0_hat, text, method="extract_features"
            )
            feats_tgt = jax.lax.stop_gradient(
                pipe.mvd_unet.apply(params, tgt_lat, text, method="extract_features")
            )
            fm = feature_matching_loss(feats_pred, feats_tgt)
            # the logged "noise_loss" stays the pure noise objective
            # (reference train/noise_loss parity); the optimizer sees the
            # weighted total
            ld = {
                **ld,
                "feature_matching_loss": fm,
                "total_loss": ld["noise_loss"]
                + cfg.loss.feature_matching_weight * fm,
            }
        if with_recon_metrics:
            from .losses import reconstruction_metrics

            def vae_decode(z):
                return pipe.vae.apply(frozen["vae"], z / sf, method=pipe.vae.decode)

            rm = reconstruction_metrics(
                schedule, pred, noisy, tgt_lat, t, vae_decode=vae_decode,
                image_metric_fns=image_metric_fns,
            )
            extra_metrics = {**extra_metrics, **rm}
        return ld.get("total_loss", ld["noise_loss"]), {**ld, **extra_metrics}

    return loss_fn


def _single_compile_step(step):
    """AOT-compile ``step`` with XLA-chosen (AUTO) layouts for the donated
    train state, killing the historical double compile: under plain ``jit``
    the first execution's donated outputs came back with XLA-preferred
    layouts that differed from the default input layouts, retriggering a
    second ~90 s full-scale compile on call 2 (CLAUDE.md "measured facts").
    With ``Format(Layout.AUTO)`` on the state input AND the full output, XLA
    assigns one self-consistent layout set in a single compilation; the
    caller's initial state is relaid out once (cheap device_put) to the
    chosen input formats, after which every donated round-trip is a layout
    fixed point. Exposes ``wrapped.compile_count`` for tests."""
    from jax.experimental.layout import Format, Layout

    cache: Dict[Any, Any] = {}

    def signature(tree):
        flat, treedef = jax.tree_util.tree_flatten(tree)
        return (
            treedef,
            tuple(
                (x.shape, jnp.result_type(x).name) if hasattr(x, "shape") else x
                for x in flat
            ),
        )

    def wrapped(state, frozen, batch, rng):
        key = signature((state, frozen, batch, rng))
        entry = cache.get(key)
        if entry is None:
            auto = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), state)
            jitted = jax.jit(
                step,
                donate_argnums=(0,),
                in_shardings=(auto, None, None, None),
                out_shardings=Format(Layout.AUTO),
            )
            compiled = jitted.lower(state, frozen, batch, rng).compile()
            state_formats = compiled.input_formats[0][0]
            cache[key] = entry = (compiled, state_formats)
            wrapped.compile_count += 1
        compiled, state_formats = entry
        if state is not wrapped._last_state_out:
            # fresh state (first call / checkpoint restore): relayout once to
            # the XLA-chosen input formats; states produced by this step are
            # already at the layout fixed point (out formats == in formats)
            state = jax.tree_util.tree_map(jax.device_put, state, state_formats)
        new_state, metrics = compiled(state, frozen, batch, rng)
        wrapped._last_state_out = new_state
        return new_state, metrics

    wrapped.compile_count = 0
    wrapped._last_state_out = None
    return wrapped


def make_eval_fn(
    pipe,
    schedule: NoiseSchedule,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    view_sharded: bool = False,
    with_recon_metrics: bool = False,
    image_metric_fns: Optional[Dict[str, Any]] = None,
):
    """Grad-free loss/metric evaluation over (B, V, ...) batches.

    Mirrors make_train_step's parallelism: under view sharding the model
    carries a bound view axis (ring attention), so the loss MUST run inside
    shard_map — applying it directly (as a bare jitted loss_fn would) hits
    an unbound axis name."""
    loss_fn = make_loss_fn(
        pipe, schedule, cfg,
        with_recon_metrics=with_recon_metrics, image_metric_fns=image_metric_fns,
    )

    if not view_sharded:
        def eval_fn(params, frozen, batch, rng):
            flat_batch = {k: _flat(v) for k, v in batch.items()}
            return loss_fn(params, frozen, flat_batch, rng)

        return jax.jit(eval_fn)

    assert mesh is not None and pipe.config.unet.view_axis == "view"

    def local_eval(params, frozen, batch, rng):
        rng = jax.random.fold_in(rng, lax.axis_index("data"))
        rng = jax.random.fold_in(rng, lax.axis_index("view"))
        flat_batch = {k: _flat(v) for k, v in batch.items()}
        loss, metrics = loss_fn(params, frozen, flat_batch, rng)
        loss = lax.pmean(loss, ("data", "view"))
        metrics = jax.tree_util.tree_map(
            lambda m: lax.pmean(m, ("data", "view")), metrics
        )
        return loss, metrics

    def global_eval(params, frozen, batch, rng):
        bv = lambda nd: P("data", "view", *([None] * (nd - 2)))
        mapped = shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(
                P(),
                P(),
                jax.tree_util.tree_map(lambda x: bv(x.ndim), batch),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return mapped(params, frozen, batch, rng)

    return jax.jit(global_eval)


def make_train_step(
    pipe,
    schedule: NoiseSchedule,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    view_sharded: bool = False,
):
    """Returns jitted fn(state, frozen, batch, rng) -> (state, metrics).

    ``batch`` entries are (B, V, ...) arrays."""

    def loss_for(batch, dedupe_ok=True):
        # V is static at trace time; consecutive flat rows share a source
        # iff the batch came through the group loader (V > 1,
        # data/objaverse.py:_load_group) — encode unique sources only then
        V = batch["input_ids"].shape[1]
        rep = V if (dedupe_ok and V > 1 and cfg.unique_source_encode) else 1
        return make_loss_fn(pipe, schedule, cfg, source_repeat=rep)

    if view_sharded:
        assert mesh is not None and pipe.config.unet.view_axis == "view"

        def local_loss(params, frozen, batch, rng):
            rng = jax.random.fold_in(rng, lax.axis_index("data"))
            rng = jax.random.fold_in(rng, lax.axis_index("view"))
            # inside shard_map: shapes (and therefore V) are LOCAL blocks
            loss_fn = loss_for(batch)
            flat_batch = {k: _flat(v) for k, v in batch.items()}
            loss, metrics = loss_fn(params, frozen, flat_batch, rng)
            loss = lax.pmean(loss, ("data", "view"))
            metrics = jax.tree_util.tree_map(
                lambda m: lax.pmean(m, ("data", "view")), metrics
            )
            return loss, metrics

        def global_loss(params, frozen, batch, rng):
            bv = lambda nd: P("data", "view", *([None] * (nd - 2)))
            mapped = shard_map(
                functools.partial(local_loss),
                mesh=mesh,
                in_specs=(
                    P(),
                    P(),
                    jax.tree_util.tree_map(lambda x: bv(x.ndim), batch),
                    P(),
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return mapped(params, frozen, batch, rng)

        def step(state: TrainState, frozen, batch, rng):
            mask = trainable_mask(state.params, cfg.train_denoising_unet)
            t_params, f_params = split_params(state.params, mask)

            def loss_t(tp, frozen, batch, rng):
                return global_loss(merge_params(tp, f_params), frozen, batch, rng)

            (loss, metrics), grads_t = jax.value_and_grad(loss_t, has_aux=True)(
                t_params, frozen, batch, rng
            )
            metrics = dict(metrics)
            metrics.update(grad_group_norms(grads_t))
            metrics.update(grad_group_samples(grads_t))
            grads = merge_params(
                grads_t, jax.tree_util.tree_map(jnp.zeros_like, f_params)
            )
            state = state.apply_gradients(grads)
            return state, metrics

        return jax.jit(step, donate_argnums=(0,))

    # --- default: DP over (data, view) on flat rows via shardings ---
    def step(state: TrainState, frozen, batch, rng):
        # with a sharded view axis the [::V] source slice would gather
        # across shards — dedupe only when the view axis is whole
        view_whole = mesh is None or mesh.shape.get("view", 1) == 1
        loss_fn = loss_for(batch, dedupe_ok=view_whole)
        flat_batch = {k: _flat(v) for k, v in batch.items()}
        mask = trainable_mask(state.params, cfg.train_denoising_unet)
        t_params, f_params = split_params(state.params, mask)

        def loss_t(tp, frozen, batch, rng):
            return loss_fn(merge_params(tp, f_params), frozen, batch, rng)

        (loss, metrics), grads_t = jax.value_and_grad(loss_t, has_aux=True)(
            t_params, frozen, flat_batch, rng
        )
        metrics = dict(metrics)
        metrics.update(grad_group_norms(grads_t))
        metrics.update(grad_group_samples(grads_t))
        grads = merge_params(
            grads_t, jax.tree_util.tree_map(jnp.zeros_like, f_params)
        )
        state = state.apply_gradients(grads)
        return state, metrics

    if mesh is None:
        return _single_compile_step(step)

    repl = NamedSharding(mesh, P())
    bv = lambda nd: NamedSharding(mesh, P("data", "view", *([None] * (nd - 2))))

    def shard_args(state, frozen, batch, rng):
        batch = {
            k: jax.device_put(v, bv(v.ndim)) for k, v in batch.items()
        }
        return batch

    # no explicit in_shardings: the batch is device_put with the
    # (data, view) sharding up front and everything else stays replicated
    # by construction; explicit in_shardings were observed to retrigger a
    # second compile (input layout change after the first donated step)
    jitted = jax.jit(step, donate_argnums=(0,))

    def wrapped(state, frozen, batch, rng):
        batch = shard_args(state, frozen, batch, rng)
        return jitted(state, frozen, batch, rng)

    return wrapped
