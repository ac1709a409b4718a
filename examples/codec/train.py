"""Programmatic neural-codec training (reference counterpart: the pretrained
DAC/EnCodec models the ACProcessor loads, audio_processors.py:378): trains the
framework's residual-VQ codec (models/codec/rvq.py) on the mini speech corpus
with L1 + multi-resolution STFT + commitment losses, and optionally saves a
one-file checkpoint that backs:

  * ``codec_features(model_ckpt=...)``   — the data-pipeline handler
  * ``CodecFeatures`` (vocoder_mel_dac)  — frozen codec front-end
  * ``XTTSModel``                        — warm-started acoustic tokens

  python examples/codec/train.py [--steps 200] [--save /path/codec.pkl]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

DATA = "/root/reference/examples/simple_datasets/speech/SEGS"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--chunk_s", type=float, default=0.75)
    p.add_argument("--platform", default=None)
    p.add_argument("--data_root", default=DATA)
    p.add_argument("--save", default=None, help="state_io checkpoint path")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.io import AudioChunk, construct_file_list
    from speechflow_tpu.models.codec import CodecParams, NeuralCodec
    from speechflow_tpu.models.codec.rvq import codec_criterion

    files = construct_file_list(args.data_root, ext=".wav")
    waves = [AudioChunk(file_path=f).load(sr=24000).waveform for f in files]
    print(f"{len(waves)} utterances")

    params = CodecParams(channels=32, latent_dim=64, strides=(4, 8, 8),
                         n_quantizers=4, codebook_size=256)
    model = NeuralCodec(params, rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(3e-4), wrt=nnx.Param)
    crit = codec_criterion(sample_rate=24000)

    @nnx.jit
    def step(model, opt, wav):
        def loss_fn(m):
            return sum(crit(m(wav), {"waveform": wav}, 0).values())

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    rng = np.random.default_rng(0)
    n = int(args.chunk_s * 24000)
    n -= n % int(np.prod(params.strides))
    first = last = None
    for it in range(args.steps):
        xs = []
        for _ in range(args.batch):
            w = waves[int(rng.integers(0, len(waves)))]
            if len(w) < n:
                w = np.pad(w, (0, n - len(w)))
            s = int(rng.integers(0, max(len(w) - n, 1)))
            xs.append(w[s : s + n])
        loss = float(step(model, opt, jnp.asarray(np.stack(xs))))
        first = loss if first is None else first
        last = loss
        if it % 50 == 0:
            print(f"step {it}: loss {loss:.4f}")
    print(f"codec loss: {first:.3f} -> {last:.3f}")

    if args.save:
        from speechflow_tpu.utils.state_io import save_module

        save_module(model, params, args.save)
        print(f"saved codec -> {args.save}")
    return model


if __name__ == "__main__":
    main()
