"""Minimal full-stack usage example (reference: examples/mnist/scripts/train.py):
ImageDSParser -> ImageCollate -> a LeNet-style nnx model -> Trainer.

Uses the reference MNIST raw files when present; otherwise generates a
synthetic shape-classification dataset so the example runs anywhere.

  python examples/mnist/train.py [--steps 200] [--platform cpu]
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

MNIST_RAW = Path("/root/reference/examples/simple_datasets/mnist/MNIST/raw")


def load_mnist_or_synthetic(n: int = 2048):
    idx_img = MNIST_RAW / "train-images-idx3-ubyte"
    idx_lab = MNIST_RAW / "train-labels-idx1-ubyte"
    if idx_img.exists() and idx_lab.exists():
        with idx_img.open("rb") as f:
            _, num, rows, cols = struct.unpack(">IIII", f.read(16))
            images = np.frombuffer(f.read(), np.uint8).reshape(num, rows, cols)
        with idx_lab.open("rb") as f:
            struct.unpack(">II", f.read(8))
            labels = np.frombuffer(f.read(), np.uint8)
        return images[:n].astype(np.float32) / 255.0, labels[:n].astype(np.int32)
    # synthetic: 4 classes of simple 28x28 shapes + noise
    rng = np.random.default_rng(0)
    images, labels = [], []
    for i in range(n):
        lab = i % 4
        img = rng.normal(0, 0.1, (28, 28)).astype(np.float32)
        if lab == 0:
            img[10:18, 4:24] += 1.0            # horizontal bar
        elif lab == 1:
            img[4:24, 10:18] += 1.0            # vertical bar
        elif lab == 2:
            img[6:22, 6:22] += np.eye(16)      # diagonal
        else:
            yy, xx = np.mgrid[:28, :28]
            img[((yy - 14) ** 2 + (xx - 14) ** 2) < 64] += 1.0  # disk
        images.append(img)
        labels.append(lab)
    return np.stack(images), np.asarray(labels, np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.data.collate import ImageCollate
    from speechflow_tpu.data.core import Dataset
    from speechflow_tpu.data.core.datasample import ImageDataSample
    from speechflow_tpu.data.samplers import RandomSampler
    from speechflow_tpu.training import OptimizerConfig, Trainer, TrainerConfig

    images, labels = load_mnist_or_synthetic()
    n_classes = int(labels.max()) + 1
    dataset = Dataset([
        ImageDataSample(image=img[..., None], label=str(lab), index=i)
        for i, (img, lab) in enumerate(zip(images, labels))
    ])
    sampler = RandomSampler().set_dataset(dataset)
    collate = ImageCollate(label2id={str(i): i for i in range(n_classes)})

    class LeNet(nnx.Module):
        def __init__(self, rngs=None):
            r = rngs or nnx.Rngs(0)
            self.c1 = nnx.Conv(1, 16, (5, 5), padding="SAME", rngs=r)
            self.c2 = nnx.Conv(16, 32, (5, 5), padding="SAME", rngs=r)
            self.l1 = nnx.Linear(32 * 7 * 7, 128, rngs=r)
            self.l2 = nnx.Linear(128, n_classes, rngs=r)

        def __call__(self, inputs):
            x = inputs["image"]
            x = nnx.max_pool(nnx.relu(self.c1(x)), (2, 2), (2, 2))
            x = nnx.max_pool(nnx.relu(self.c2(x)), (2, 2), (2, 2))
            x = x.reshape(x.shape[0], -1)
            return self.l2(nnx.relu(self.l1(x)))

    import optax

    def criterion(logits, targets, step):
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets["label"])
        acc = jnp.mean((jnp.argmax(logits, -1) == targets["label"]).astype(jnp.float32))
        return {"ce": jnp.mean(ce), "constant_acc": acc}

    class Loader:
        def next_batch(self):
            samples, _ = sampler.sampling(args.batch)
            return collate(samples)

    trainer = Trainer(
        LeNet(), criterion,
        lambda c: ({"image": c.image}, {"label": c.label_id}),
        OptimizerConfig(lr=1e-3),
        TrainerConfig(max_steps=args.steps, log_every=50),
    )
    first = trainer.training_step(Loader().next_batch())
    last = trainer.fit(Loader())
    print(f"ce: {first['ce']:.3f} -> {last['ce']:.3f}; accuracy: {last['constant_acc']:.3f}")
    assert last["constant_acc"] > 0.8, "example failed to learn"


if __name__ == "__main__":
    main()
