"""speechflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech & TTS framework.

Capability-parity rebuild of the SpeechFlow toolkit (reference: just-ai/speechflow):
dataset annotation (ASR + MAS forced alignment -> Praat TextGrids), a declarative
config-driven data-preparation service streaming fixed-shape padded batches,
a modular acoustic-model construction kit (FastSpeech/CFM/DiT-style), and
Vocos/HiFi-GAN/BigVGAN-class vocoders with GAN training — re-founded on
jit-compiled feature extraction, pjit/shard_map data parallelism over a device
mesh, Pallas kernels for the hot DP/DSP loops, and orbax checkpoints.
"""

__version__ = "0.1.0"
