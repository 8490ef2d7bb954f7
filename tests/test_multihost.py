"""Multi-host (multi-process) training tests.

The reference scales with one-process-per-GPU DDP under SLURM (reference
train.py:175-186, train.sh:5-9); the TPU-native equivalent is one process
per host joined by jax.distributed (mvd_tpu/distributed.py). These tests
cover:

  * the DistributedSampler-equivalent loader slicing (each process loads a
    contiguous disjoint row block of every global batch, together covering
    it exactly),
  * a REAL 2-process integration run (subprocesses, gloo collectives, 2
    virtual CPU devices each): Trainer.fit over a host-spanning "data"=4
    mesh, asserting run-dir agreement, primary-only metric logging, a
    coordinated orbax checkpoint, and bitwise-level loss parity of the
    assembled global batch against the single-process run (which also pins
    global row ORDER, not just content — per-row timesteps ride the rng).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from mvd_tpu.config import TINY_MODEL, LossConfig, OptimizerConfig, TrainConfig
from mvd_tpu.data.objaverse import DataLoader, ObjaverseDataModule, ObjaverseDataset
from mvd_tpu.data.tokenizer import HashTokenizer
from tests.test_data import make_zip

IMG = TINY_MODEL.unet.sample_size * 8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "data"
    (root / "renders_final").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(10):
        make_zip(root / "renders_final" / f"obj_{i}.zip", num_views=3, size=IMG, rng=rng)
    return str(root)


def _loader(corpus, process_count=1, process_index=0, batch_size=4):
    ds = ObjaverseDataset(corpus, "train", image_size=16)
    return DataLoader(
        ds,
        HashTokenizer(),
        batch_size=batch_size,
        shuffle=False,
        num_workers=1,
        process_count=process_count,
        process_index=process_index,
    )


def test_process_slices_partition_global_batches(corpus):
    """Every global batch = concat of the per-process blocks, in rank order."""
    full = list(_loader(corpus))
    p0 = list(_loader(corpus, process_count=2, process_index=0))
    p1 = list(_loader(corpus, process_count=2, process_index=1))
    assert len(full) == len(p0) == len(p1) > 0
    for fb, b0, b1 in zip(full, p0, p1):
        for k in fb:
            assert b0[k].shape[0] == b1[k].shape[0] == fb[k].shape[0] // 2
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]], axis=0), fb[k]
            )


def test_global_step_count_is_process_invariant(corpus):
    assert len(_loader(corpus)) == len(_loader(corpus, process_count=2))


def test_indivisible_batch_rejected(corpus):
    with pytest.raises(ValueError, match="divisible"):
        _loader(corpus, process_count=3, batch_size=4)


def test_initialize_noop_single_process(monkeypatch):
    """No coordinator, no env, no SLURM: initialize must be a no-op."""
    from mvd_tpu import distributed

    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    monkeypatch.delenv("MVD_COORDINATOR", raising=False)
    assert distributed.initialize() is False
    assert distributed.is_primary()
    assert distributed.broadcast_str("abc") == "abc"


def test_global_batch_identity_single_process():
    from mvd_tpu.distributed import global_batch, replicate_to_mesh
    from mvd_tpu.mesh import make_mesh

    mesh = make_mesh(data=4)
    batch = {"x": np.ones((4, 1, 3), np.float32)}
    assert global_batch(mesh, batch) is batch
    tree = {"w": np.ones((2,), np.float32)}
    assert replicate_to_mesh(mesh, tree) is tree


@pytest.mark.slow
def test_two_process_training(corpus, tmp_path):
    """Real 2-process run over gloo: see tests/_multihost_child.py."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    outdir = str(tmp_path / "mh")
    os.makedirs(outdir, exist_ok=True)
    child = os.path.join(REPO, "tests", "_multihost_child.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), str(port), corpus, outdir],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=2700)
            outs.append(out)
    finally:
        for p in procs:  # a timeout must not orphan the gloo children
            if p.poll() is None:
                p.kill()
                p.communicate()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-4000:]}"

    results = {}
    for pid in (0, 1):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results[pid] = json.load(f)

    # both processes completed the same global steps into the SAME run dir
    assert results[0]["step"] == results[1]["step"] == 2
    assert results[0]["root"] == results[1]["root"]
    # a coordinated checkpoint exists and both processes see it
    assert results[0]["ckpt_latest"] == results[1]["ckpt_latest"] == 2
    # elastic resubmit: a fresh Trainer restored the coordinated checkpoint
    # under the multi-host runtime (tests/_multihost_child.py phase 2)
    assert results[0]["resume_step"] == results[1]["resume_step"] == 2
    # primary-only logging (on this shared-FS box both processes see the
    # same jsonl file — written by the primary; the non-primary's logger is
    # a no-op sink)
    assert results[0]["logger_enabled"] and results[0]["jsonl_rows"] > 0
    assert not results[1]["logger_enabled"]
    # replicated loss: both processes computed the same global value
    assert results[0]["loss0"] == pytest.approx(results[1]["loss0"], rel=0, abs=0)

    # single-process parity on the SAME global batch/rng: pins that the
    # two processes' row blocks assembled into the right global order
    from mvd_tpu.mesh import make_mesh
    from mvd_tpu.pipeline import MVDPipeline
    from mvd_tpu.train.loop import Trainer

    pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))
    cfg = TrainConfig(
        model=TINY_MODEL,
        loss=LossConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-4),
        batch_size=1,
        image_size=IMG,
        max_epochs=1,
        max_steps=2,
        checkpoint_every_steps=2,
        log_every_steps=1,
        metrics_log_interval=0,
    )
    dm = ObjaverseDataModule(
        corpus, pipe.tokenizer, image_size=IMG, batch_size=4, num_workers=1
    )
    dm.setup()
    tr = Trainer(cfg, pipe, dm, mesh=make_mesh(data=4), output_dir=str(tmp_path / "sp"))
    first = next(iter(dm.loader("train", shuffle=False)))
    loss0, _ = tr.loss_fn(
        tr.state.params, tr.frozen, first, jax.random.PRNGKey(123)
    )
    assert results[0]["loss0"] == pytest.approx(float(loss0), rel=2e-5)

    # multi-host validation GENERATION (reference training.py:300-343 under
    # DDP): the primary generated through the host-local pipeline, the
    # non-primary skipped, and the generated-image metrics match this
    # single-process run bit-for-tolerance (same fresh-init params, same
    # first local rows, same seed)
    assert results[1]["gen"] == {}
    mh_gen = results[0]["gen"]
    assert {"val/gen_pixel_mse", "val/gen_psnr", "val/gen_ssim"} <= set(mh_gen)
    sp_gen = tr._generation_metrics([first], 0)
    for k, v in sp_gen.items():
        assert mh_gen[k] == pytest.approx(v, rel=1e-3), (k, mh_gen[k], v)
