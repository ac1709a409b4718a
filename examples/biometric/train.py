"""Programmatic (config-free) pipeline + triplet speaker-verification training
(reference: examples/biometric/train.py): AudioDSParser over the mini speech
dataset -> mel features -> TripletSampler -> ECAPA embedder + cosine triplet
loss. The trained embedder can then back the voice_biometrics handler
(speechflow_tpu.data.processors.embeddings.set_biometric_model).

  python examples/biometric/train.py [--steps 60] [--platform cpu]
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
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=4)  # triplets per step
    p.add_argument("--platform", default=None)
    p.add_argument("--data_root", default=DATA)
    p.add_argument("--save", default=None, help="save the trained embedder (state_io pickle)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.data.parsers import AudioDSParser
    from speechflow_tpu.data.processors.audio import load_audio, random_chunk
    from speechflow_tpu.data.processors.spectral import amp_to_db, linear_to_mel, magnitude
    from speechflow_tpu.data.samplers import TripletSampler
    from speechflow_tpu.io import construct_file_list
    from speechflow_tpu.models.biometric import ECAPAEmbedder, ECAPAParams
    from speechflow_tpu.models.biometric.ecapa import triplet_loss

    # programmatic pipeline: no configs, just the pieces
    files = construct_file_list(args.data_root, ext=".wav")
    parser = AudioDSParser()
    dataset = parser.read_datasamples(files)
    print(f"{len(dataset)} utterances, speakers: "
          f"{sorted({dataset[i].speaker_name for i in range(len(dataset))})}")

    def featurize(ds):
        ds = load_audio(ds, sample_rate=24000)
        ds = random_chunk(ds, chunk_duration=1.5, seed=ds.index)
        ds = magnitude(ds, n_fft=1024, hop_len=256)
        ds = linear_to_mel(ds, n_mels=80)
        return amp_to_db(ds)

    sampler = TripletSampler(field="speaker_name").set_dataset(dataset)
    model = ECAPAEmbedder(ECAPAParams(n_mels=80, channels=64, emb_dim=64,
                                      n_blocks=2), rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, mel):
        def loss_fn(m):
            emb = m(mel)
            a, p_, n = jnp.split(emb, 3, axis=0)
            return triplet_loss(a, p_, n)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    first = last = None
    for it in range(args.steps):
        samples, _ = sampler.sampling(args.batch)
        mels = [featurize(s.copy()).mel[:128] for s in samples]
        t = max(len(m) for m in mels)
        mel = np.stack([np.pad(m, ((0, t - len(m)), (0, 0))) for m in mels])
        loss = float(step(model, opt, jnp.asarray(mel)))
        first = loss if first is None else first
        last = loss
        if it % 20 == 0:
            print(f"step {it}: triplet loss {loss:.4f}")
    print(f"triplet loss: {first:.3f} -> {last:.3f}")
    if args.save:
        from speechflow_tpu.utils.state_io import save_module

        save_module(model, model.p if hasattr(model, "p") else ECAPAParams(
            n_mels=80, channels=64, emb_dim=64, n_blocks=2), args.save)
        print(f"saved embedder -> {args.save}")
    return model


if __name__ == "__main__":
    main()
