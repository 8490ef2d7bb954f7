"""Latent-moment cache: precompute tool, dataset plumbing, and train-step
parity. A float32 cache stores the same posterior the in-step encoder
produces (to f32 ulp — XLA fuses the encoder differently per batch shape)
and the step draws eps with the same key/shape, so cached-moment training
matches pixel training to float32 numerical noise. Also covers the train
step's unique-source moment tiling (encode each view-group's source once —
that one IS bitwise, same batch shapes throughout)."""

import io
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mvd_tpu.config import TINY_MODEL, LossConfig, OptimizerConfig, TrainConfig
from mvd_tpu.data.latent_cache import (
    LatentCacheReader,
    cache_file_for,
    corpus_zips,
    precompute_latent_cache,
)
from mvd_tpu.data.objaverse import (
    DataLoader,
    ObjaverseDataset,
    _load_image_from_bytes,
    collate,
)
from mvd_tpu.pipeline import MVDPipeline
from mvd_tpu.train.step import make_loss_fn

IMG = 64  # corpus image size; tiny VAE downsamples /8 -> 8x8x4 moments
# (the tiny UNet's down path needs 8x8 latents — 32px images would give 4x4)


def make_zip(path, num_views=4, size=IMG, prompt="a red chair", rng=None):
    rng = rng or np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as z:
        for v in range(num_views):
            img = Image.fromarray(
                rng.integers(0, 255, (size, size, 4), dtype=np.uint8), "RGBA"
            )
            buf = io.BytesIO()
            img.save(buf, "PNG")
            z.writestr(f"{v:03d}.png", buf.getvalue())
            cam = np.eye(4, dtype=np.float32)
            cam[:3, 3] = rng.standard_normal(3)
            buf = io.BytesIO()
            np.save(buf, cam)
            z.writestr(f"{v:03d}.npy", buf.getvalue())
        z.writestr("prompt.txt", prompt)
        z.writestr("metadata.json", json.dumps({"views": num_views}))


@pytest.fixture(scope="module")
def pipe():
    return MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "data"
    (root / "renders_final").mkdir(parents=True)
    rng = np.random.default_rng(42)
    for i in range(6):
        make_zip(root / "renders_final" / f"obj_{i}.zip", num_views=4, rng=rng)
    return str(root)


@pytest.fixture()
def cache(corpus, tmp_path, pipe):
    out = str(tmp_path / "latcache")
    stats = precompute_latent_cache(
        pipe.vae, pipe.params["vae"], corpus_zips(corpus), out,
        image_size=IMG, batch_size=3,
    )
    assert stats["zips"] == 6 and stats["views"] == 24
    return out


def _tokenizer():
    class Tok:
        def __call__(self, prompts):
            return np.ones((len(prompts), 77), np.int32)

    return Tok()


def test_precompute_moments_match_direct_encode(corpus, cache, pipe):
    zp = corpus_zips(corpus)[0]
    reader = LatentCacheReader(cache, image_size=IMG)
    with zipfile.ZipFile(zp) as zf:
        px = _load_image_from_bytes(zf.read("002.png"), IMG)
    mean, logvar = pipe.vae.apply(
        pipe.params["vae"], px[None], method=pipe.vae.encode_moments
    )
    mom = reader.read(zp, 2)
    # the cache was encoded at batch 3, the reference here at batch 1 — XLA
    # fuses the conv stacks differently per batch shape, so agreement is to
    # float32 ulp, not bitwise
    np.testing.assert_allclose(mom[0], np.asarray(mean)[0], rtol=0, atol=1e-5)
    np.testing.assert_allclose(mom[1], np.asarray(logvar)[0], rtol=0, atol=1e-5)


def test_precompute_resume_skips_cached(corpus, cache, pipe):
    stats = precompute_latent_cache(
        pipe.vae, pipe.params["vae"], corpus_zips(corpus), cache,
        image_size=IMG, batch_size=3,
    )
    assert stats["zips"] == 0 and stats["skipped"] == 6


def test_reader_rejects_wrong_image_size(cache):
    with pytest.raises(ValueError, match="image_size"):
        LatentCacheReader(cache, image_size=IMG * 2)


def test_meta_records_views_and_compute_dtype(corpus, tmp_path, pipe):
    from mvd_tpu.data.latent_cache import read_meta

    out = str(tmp_path / "latcache_meta")
    precompute_latent_cache(
        pipe.vae, pipe.params["vae"], corpus_zips(corpus), out,
        image_size=IMG, batch_size=3, compute_dtype="float32",
    )
    meta = read_meta(out)
    assert meta["compute_dtype"] == "float32"
    # views map covers every zip so setup-time validation is one JSON read
    assert set(meta["views"]) == {f"obj_{i}" for i in range(6)}
    assert meta["views"]["obj_0"] == ["000", "001", "002", "003"]
    # the reader serves view_keys from the meta (no npz open)
    reader = LatentCacheReader(out, image_size=IMG)
    zp = corpus_zips(corpus)[0]
    import os

    os.rename(cache_file_for(out, zp), cache_file_for(out, zp) + ".hidden")
    assert reader.view_keys(zp) == ["000", "001", "002", "003"]
    os.rename(cache_file_for(out, zp) + ".hidden", cache_file_for(out, zp))


def test_precompute_refuses_compute_dtype_mix(corpus, tmp_path, pipe):
    """Extending a cache encoded at different numerics must fail loudly —
    bf16-vs-f32 moments differ by encode error with no per-file marker."""
    out = str(tmp_path / "latcache_mix")
    precompute_latent_cache(
        pipe.vae, pipe.params["vae"], corpus_zips(corpus)[:2], out,
        image_size=IMG, batch_size=3, compute_dtype="float32",
    )
    with pytest.raises(ValueError, match="compute_dtype"):
        precompute_latent_cache(
            pipe.vae, pipe.params["vae"], corpus_zips(corpus), out,
            image_size=IMG, batch_size=3, compute_dtype="bfloat16",
        )


def test_dataset_detects_stale_cache(corpus, cache):
    """A zip re-rendered with MORE views after caching must fail at setup
    (the cache lacks the new views), not crash mid-epoch."""
    import os

    zp = corpus_zips(corpus)[0]
    os.remove(zp)
    make_zip(zp, num_views=6)  # re-render with more views than the cache has
    with pytest.raises(ValueError, match="STALE"):
        ObjaverseDataset(
            corpus, split="train", image_size=IMG, latent_cache_dir=cache,
            val_split=0.0, test_split=0.0, max_views_per_object=6,
        )


def test_dataset_missing_cache_raises(corpus, tmp_path, cache):
    # drop one cache file -> coverage check fails loudly at construction
    import os

    zp = corpus_zips(corpus)[0]
    os.remove(cache_file_for(cache, zp))
    with pytest.raises(FileNotFoundError, match="missing"):
        ObjaverseDataset(
            corpus, split="train", image_size=IMG, latent_cache_dir=cache,
            val_split=0.0, test_split=0.0,
        )


def test_dataset_and_loader_yield_moments(corpus, cache):
    ds = ObjaverseDataset(
        corpus, split="train", image_size=IMG, latent_cache_dir=cache,
        val_split=0.0, test_split=0.0,
    )
    s = ds[0]
    assert set(s) == {
        "source_moments", "target_moments", "source_camera", "target_camera",
        "prompt",
    }
    assert s["source_moments"].shape == (2, IMG // 8, IMG // 8, 4)
    # group loader: V samples share the source moments
    dl = DataLoader(ds, _tokenizer(), batch_size=1, views_per_sample=2,
                    num_workers=1, shuffle=False)
    batch = next(iter(dl))
    assert batch["source_moments"].shape[:2] == (1, 2)
    np.testing.assert_array_equal(
        batch["source_moments"][0, 0], batch["source_moments"][0, 1]
    )
    assert "source_image" not in batch


def _flat_batch_from(samples, V):
    b = collate(samples, _tokenizer(), V)
    return {k: jnp.asarray(v).reshape((-1,) + v.shape[2:]) for k, v in b.items()}


def test_loss_parity_moments_vs_pixels(corpus, cache, pipe):
    """Cached-moment training matches pixel training to f32 noise (the
    ~1e-6 moment ulp difference amplifies through the UNet + v-target to
    ~1e-4 relative on the loss)."""
    ds_px = ObjaverseDataset(corpus, split="train", image_size=IMG,
                             val_split=0.0, test_split=0.0)
    ds_mom = ObjaverseDataset(corpus, split="train", image_size=IMG,
                              latent_cache_dir=cache,
                              val_split=0.0, test_split=0.0)
    flat_px = _flat_batch_from([ds_px[0], ds_px[1]], V=1)
    flat_mom = _flat_batch_from([ds_mom[0], ds_mom[1]], V=1)

    cfg = TrainConfig(model=TINY_MODEL, loss=LossConfig(),
                      optimizer=OptimizerConfig(), batch_size=2,
                      image_size=IMG)
    loss_fn = make_loss_fn(pipe, pipe.schedule, cfg)
    frozen = {"vae": pipe.params["vae"],
              "text_encoder": pipe.params["text_encoder"]}
    rng = jax.random.PRNGKey(7)
    l_px, m_px = jax.jit(loss_fn)(pipe.params["mvd"], frozen, flat_px, rng)
    l_mom, m_mom = jax.jit(loss_fn)(pipe.params["mvd"], frozen, flat_mom, rng)
    np.testing.assert_allclose(float(l_px), float(l_mom), rtol=1e-3)
    np.testing.assert_allclose(
        float(m_px["noise_loss"]), float(m_mom["noise_loss"]), rtol=1e-3
    )


def test_unique_source_encode_parity(pipe):
    """source_repeat=V tiling reproduces the naive per-row encode exactly
    (same posterior per repeated row, same eps shape/key)."""
    V = 2
    rng = np.random.default_rng(3)
    src = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    samples = []
    for v in range(V):
        samples.append({
            "source_image": src[0],
            "target_image": rng.standard_normal((IMG, IMG, 3)).astype(np.float32),
            "source_camera": np.eye(4, dtype=np.float32),
            "target_camera": np.eye(4, dtype=np.float32),
            "prompt": "x",
        })
    flat = _flat_batch_from(samples, V=V)

    cfg = TrainConfig(model=TINY_MODEL, loss=LossConfig(),
                      optimizer=OptimizerConfig(), batch_size=1,
                      image_size=IMG, num_views=V)
    frozen = {"vae": pipe.params["vae"],
              "text_encoder": pipe.params["text_encoder"]}
    key = jax.random.PRNGKey(11)
    naive = make_loss_fn(pipe, pipe.schedule, cfg, source_repeat=1)
    deduped = make_loss_fn(pipe, pipe.schedule, cfg, source_repeat=V)
    l1, _ = jax.jit(naive)(pipe.params["mvd"], frozen, flat, key)
    l2, _ = jax.jit(deduped)(pipe.params["mvd"], frozen, flat, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
