"""Multi-host test worker: one rank of a jax.distributed CPU job.

Launched as a subprocess by tests/test_multihost.py (and usable standalone):

    python multihost_worker.py --rank R --world N --port P --mode trainstep \
        --out result.json [--local-devices 4]

Modes:

- ``trainstep``: build a deterministic toy model + Trainer(use_mesh=True),
  feed each rank its slice of one seeded global batch, run 3 training steps,
  write the per-step losses. A world=1 run with all 8 devices produces the
  ground truth the multi-process run must match bit-for-bit (the VERDICT r2
  acceptance: multi-process loss == single-process 8-device loss).
- ``dataplane``: rank0 hosts a DataServer over a synthetic dataset through
  ``init_data_loader_distributed`` (address broadcast via jax collectives);
  every rank pulls batches and records which sample labels it saw, so the
  test can assert rank-disjoint delivery (DDP per-rank batch split parity,
  reference data_server/helpers.py:154-188).
"""

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--mode", choices=["trainstep", "dataplane"], required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from speechflow_tpu.parallel.distributed import init_distributed

    if args.world > 1:
        init_distributed(f"127.0.0.1:{args.port}", num_processes=args.world,
                         process_id=args.rank)

    result = {"rank": args.rank, "world": args.world}
    if args.mode == "trainstep":
        result.update(run_trainstep(args))
    else:
        result.update(run_dataplane(args))

    with open(args.out, "w") as f:
        json.dump(result, f)


def run_trainstep(args) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.training.optimizer import OptimizerConfig
    from speechflow_tpu.training.trainer import Trainer, TrainerConfig

    class Toy(nnx.Module):
        def __init__(self, rngs):
            self.l1 = nnx.Linear(16, 64, rngs=rngs)
            self.l2 = nnx.Linear(64, 4, rngs=rngs)

        def __call__(self, inputs):
            return self.l2(nnx.tanh(self.l1(inputs["x"])))

    def criterion(outputs, targets, step):
        return {"mse": jnp.mean((outputs - targets["y"]) ** 2)}

    def batch_processor(batch):
        return batch["inputs"], batch["targets"]

    model = Toy(nnx.Rngs(0))
    trainer = Trainer(model, criterion, batch_processor,
                      optimizer_config=OptimizerConfig(lr=1e-2),
                      config=TrainerConfig(use_mesh=True, max_steps=3))

    global_bs = 8
    rng = np.random.default_rng(42)  # same seed on every rank
    gx = rng.normal(size=(global_bs, 16)).astype(np.float32)
    gy = rng.normal(size=(global_bs, 4)).astype(np.float32)
    per = global_bs // args.world
    lo = args.rank * per
    batch = {"inputs": {"x": gx[lo:lo + per]},
             "targets": {"y": gy[lo:lo + per]}}
    losses = []
    for _ in range(3):  # fixed batch: loss must strictly decrease
        m = trainer.training_step(batch)
        losses.append(float(m["mse"]))  # losses are lazy device scalars
    return {"losses": losses}


def run_dataplane(args) -> dict:
    from speechflow_tpu.data.core import DataSample, Dataset
    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.io import Config
    from speechflow_tpu.server import init_data_loader_distributed

    pipeline = None
    if args.rank == 0:
        cfg = Config({
            "dataset": {"subsets": ["train"]},
            "sampler": {"train": {"type": "SimpleSampler"}},
            "preproc": {"pipe": []},
        })
        pipeline = DataPipeline(cfg)
        ds = Dataset([DataSample(label=str(i), index=i) for i in range(32)])
        pipeline.init_components(datasets={"train": ds})

    bundle = init_data_loader_distributed(pipeline=pipeline, batch_size=4,
                                          n_workers=1, host="127.0.0.1")
    try:
        labels = []
        loader = bundle["train"]
        for _ in range(2):
            batch = loader.next_batch(timeout=120)
            labels.extend(s.label for s in batch.data_samples)
        return {"labels": labels}
    finally:
        bundle.shutdown()


if __name__ == "__main__":
    main()
