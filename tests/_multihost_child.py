"""Child process for the multi-host integration test (tests/test_multihost.py).

Runs one of two cooperating processes: each owns 2 virtual CPU devices,
joins the distributed runtime via mvd_tpu.distributed.initialize, loads its
half of every global batch, and trains the tiny model for 2 steps over a
4-device ("data"=4) host-spanning mesh. Writes a result JSON the parent
asserts on (final step, deterministic first-batch loss for parity vs the
single-process run, run-dir agreement, primary-only logging).

Usage: python tests/_multihost_child.py <process_id> <port> <corpus> <outdir>
"""

import json
import os
import sys

pid, port, corpus, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mvd_tpu.distributed import initialize, is_primary  # noqa: E402

assert initialize(
    coordinator=f"localhost:{port}", num_processes=2, process_id=pid
), "distributed runtime failed to initialize"
assert jax.process_count() == 2 and jax.device_count() == 4

from mvd_tpu.config import (  # noqa: E402
    TINY_MODEL,
    LossConfig,
    OptimizerConfig,
    TrainConfig,
)
from mvd_tpu.data.objaverse import ObjaverseDataModule  # noqa: E402
from mvd_tpu.mesh import make_mesh  # noqa: E402
from mvd_tpu.pipeline import MVDPipeline  # noqa: E402
from mvd_tpu.train.loop import Trainer  # noqa: E402

IMG = TINY_MODEL.unet.sample_size * 8

pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))
cfg = TrainConfig(
    model=TINY_MODEL,
    loss=LossConfig(),
    optimizer=OptimizerConfig(learning_rate=1e-4),
    batch_size=1,  # per data-device (4 global)
    image_size=IMG,
    max_epochs=1,
    max_steps=2,
    checkpoint_every_steps=2,
    log_every_steps=1,
    metrics_log_interval=0,
)
dm = ObjaverseDataModule(
    corpus,
    pipe.tokenizer,
    image_size=IMG,
    batch_size=4,  # global; each process loads 2 rows
    num_workers=1,
    process_count=jax.process_count(),
    process_index=jax.process_index(),
)
dm.setup()
mesh = make_mesh(data=4)
tr = Trainer(cfg, pipe, dm, mesh=mesh, output_dir=os.path.join(outdir, "run"))

# deterministic first-batch loss: pins global row ORDER (per-row timesteps
# come from the rng, so a row permutation changes the loss) — compared
# against the single-process run in the parent
first = next(iter(dm.loader("train", shuffle=False)))
loss0, _ = tr.loss_fn(
    tr.state.params, tr.frozen, tr._put_batch(first), jax.random.PRNGKey(123)
)
loss0 = float(loss0)

# multi-host validation generation (reference training.py:300-343 runs the
# full generation pass under DDP): the PRIMARY generates through the
# host-local unsharded pipeline from its local row block; the non-primary
# skips. Parity vs the single-process run is asserted in the parent (same
# fresh-init params, same local rows 0:2 of the deterministic first batch).
gen_metrics = {}
if is_primary():
    gen_metrics = tr._generation_metrics([first], 0, local=True)
else:
    # the non-primary must NOT be needed for the primary's local programs;
    # prove it by racing ahead into the next global collective (the loss
    # re-eval below) while the primary is still generating
    pass
loss0b, _ = tr.loss_fn(
    tr.state.params, tr.frozen, tr._put_batch(first), jax.random.PRNGKey(123)
)
assert float(loss0b) == loss0, "global loss changed across the generation pass"

state = tr.fit()
tr.ckpt.wait()

# elastic-resubmit shape under the multi-host runtime: a FRESH Trainer
# re-enters the same run dir and restores the coordinated checkpoint
# (each process reads the shared checkpoint, then the state replicates
# over the host-spanning mesh via replicate_to_mesh)
tr2 = Trainer(cfg, pipe, dm, mesh=mesh, resume_from=tr.dirs["root"])
assert tr2.dirs["root"] == tr.dirs["root"]
assert tr2.resume(), "multi-host resume found no checkpoint"
resume_step = int(tr2.state.step)

result = {
    "gen": {k: float(v) for k, v in gen_metrics.items()},
    "resume_step": resume_step,
    "pid": pid,
    "primary": is_primary(),
    "step": int(state.step),
    "loss0": loss0,
    "root": tr.dirs["root"],
    "logger_enabled": tr.logger.enabled,
    "jsonl_rows": (
        sum(1 for _ in open(tr.logger.jsonl_path))
        if os.path.exists(tr.logger.jsonl_path)
        else 0
    ),
    "ckpt_latest": tr.ckpt.latest_step(),
}
with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
    json.dump(result, f)
print(f"child {pid} ok: {result}", flush=True)
