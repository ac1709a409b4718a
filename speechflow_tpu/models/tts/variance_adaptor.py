"""Hierarchical variance adaptor.

Capability parity with the reference HierarchicalVarianceAdaptor
(tts/acoustic_models/modules/components/variance_adaptors/hierarchical_va.py:31,
execution semantics in SURVEY §A.1): runs configured variances in order; the
``durations`` variance is special-cased (teacher forcing when training,
prediction at inference) and triggers **length regulation** of the content
(matmul hard/soft regulator from ops); other variances (pitch/energy/...)
are predicted per token, teacher-forced at train time, optionally embedded
via VarianceEmbedding, and concatenated to or overwriting the content.
Predictions are returned for the regression losses.

Two reference predictor variants are config flags here:
``use_discriminator`` attaches a per-variance SignalDiscriminator
(tokenlevel_predictor.py:214 TokenLevelPredictorWithDiscriminator) whose
LSGAN losses flow out through the adaptor's losses dict; for durations,
``use_gradtts_fa`` replaces the external-aligner teacher with the in-model
GradTTS forced aligner (gardtts_fa.py:86) — MAS durations drive length
regulation at train time and the internal predictor drives inference.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax.numpy as jnp
from flax import nnx

from speechflow_tpu.models.tts.common import VarianceEmbedding
from speechflow_tpu.models.tts.predictors import (
    GradTTSFA,
    SignalDiscriminator,
    TokenLevelDP,
    VariancePredictor,
)
from speechflow_tpu.ops import length_regulate_hard, length_regulate_soft

__all__ = ["VarianceConfig", "HierarchicalVarianceAdaptor"]


@dataclasses.dataclass
class VarianceConfig:
    name: str                         # "durations" | "aggregate_pitch" | ...
    target: tp.Optional[str] = None   # input field with supervision (default: name)
    dim: int = 256
    n_layers: int = 3
    kernel_size: int = 5
    dropout: float = 0.1
    use_target: bool = True           # teacher-force at training time
    detach_input: bool = False
    as_embedding: bool = False        # bucketize+embed instead of raw cat
    interval: tp.Tuple[float, float] = (0.0, 880.0)
    n_bins: int = 256
    emb_dim: int = 64
    cat_to_content: bool = True
    log_scale_embedding: bool = False
    # adversarial predictor variant (reference: tokenlevel_predictor.py:214
    # TokenLevelPredictorWithDiscriminator)
    use_discriminator: bool = False
    disc_dim: int = 192
    # in-model forced alignment for durations (reference: gardtts_fa.py:86)
    use_gradtts_fa: bool = False
    fa_feat_dim: int = 100            # audio feature dim MAS aligns against (n_mels)
    fa_dim: int = 256
    # multi-stream routing (reference: hierarchical_va.py:71-146
    # input_content / cat_to_content stream indexes): which content stream
    # feeds this predictor, and which streams receive the conditioning value
    input_stream: int = 0
    cat_to_streams: tp.Optional[tp.Tuple[int, ...]] = None  # default: (input_stream,)


class HierarchicalVarianceAdaptor(nnx.Module):
    def __init__(self, dim: tp.Union[int, tp.Sequence[int]],
                 variances: tp.Sequence[VarianceConfig],
                 soft_length_regulator: bool = False, max_output_length: int = 4096,
                 rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.variances = list(variances)
        self.soft_lr = soft_length_regulator
        self.max_output_length = max_output_length
        # one or more content streams (reference hierarchical_va.py routes
        # variances between content list entries via input_content indexes)
        dims = list(dim) if isinstance(dim, (list, tuple)) else [int(dim)]
        self.n_streams = len(dims)
        self.dim = dims[0]

        self.predictors = nnx.Dict({})
        self.embeddings = nnx.Dict({})
        self.discriminators = nnx.Dict({})
        cur_dims = dims[:]
        for v in self.variances:
            s = min(v.input_stream, self.n_streams - 1)
            pred_in = cur_dims[s]
            if v.name == "durations":
                if v.use_gradtts_fa:
                    self.predictors[v.name] = GradTTSFA(
                        pred_in, v.fa_feat_dim, v.fa_dim, rngs=rngs)
                else:
                    self.predictors[v.name] = TokenLevelDP(pred_in, v.dim, rngs=rngs)
            else:
                self.predictors[v.name] = VariancePredictor(
                    pred_in, v.dim, v.n_layers, v.kernel_size, v.dropout, rngs=rngs)
                if v.use_discriminator:
                    self.discriminators[v.name] = SignalDiscriminator(
                        pred_in, v.disc_dim, rngs=rngs)
                if v.cat_to_content:
                    feat_dim = 1
                    if v.as_embedding:
                        self.embeddings[v.name] = VarianceEmbedding(
                            v.interval, v.n_bins, v.emb_dim,
                            log_scale=v.log_scale_embedding, rngs=rngs)
                        feat_dim = v.emb_dim
                    for t in (v.cat_to_streams or (s,)):
                        cur_dims[min(t, self.n_streams - 1)] += feat_dim
        self.dim_out = sum(cur_dims)

    def __call__(
        self,
        content: jnp.ndarray,                 # (B, N, D) token-level
        token_lengths: jnp.ndarray,           # (B,)
        inputs,                               # TTSForwardInput (teacher targets)
        t_out: int,                           # static max output frames
        training: bool = True,
        deterministic: bool = True,
    ):
        import jax

        predictions: tp.Dict[str, jnp.ndarray] = {}
        losses: tp.Dict[str, jnp.ndarray] = {}
        streams = list(content) if isinstance(content, (list, tuple)) else [content]

        # SSML modifiers multiply the conditioning values (SURVEY §A.1 step 3:
        # pitch_modifier -> aggregate_pitch, volume_modifier -> energy)
        modifiers = {
            "aggregate_pitch": inputs.get("pitch_modifier"),
            "aggregate_energy": inputs.get("volume_modifier"),
        }

        # 1) non-duration variances: predict from their input stream and
        # (teacher-)condition the configured streams
        for v in self.variances:
            if v.name == "durations":
                continue
            s = min(v.input_stream, len(streams) - 1)
            inp = jax.lax.stop_gradient(streams[s]) if v.detach_input else streams[s]
            pred = self.predictors[v.name](inp, token_lengths, deterministic=deterministic)
            predictions[v.name] = pred
            target = inputs.get(v.target or v.name)
            if v.use_discriminator and training and target is not None:
                d_losses = self.discriminators[v.name].lsgan_losses(
                    inp, target, pred, token_lengths)
                losses.update({f"{v.name}_{k}": lv for k, lv in d_losses.items()})
            value = target if (training and v.use_target and target is not None) \
                else jax.lax.stop_gradient(pred)
            mod = modifiers.get(v.name)
            if mod is not None:
                value = value * mod
            if v.cat_to_content:
                if v.as_embedding:
                    feat = self.embeddings[v.name](value)
                else:
                    feat = value[..., None]
                for t in (v.cat_to_streams or (s,)):
                    t = min(t, len(streams) - 1)
                    streams[t] = jnp.concatenate([streams[t], feat], axis=-1)

        # 2) durations + length regulation (all streams share the alignment)
        dur_cfg = next((v for v in self.variances if v.name == "durations"), None)
        attn = None
        out_lengths = token_lengths
        durations = None
        if dur_cfg is not None:
            ds = min(dur_cfg.input_stream, len(streams) - 1)
            dur_in = (jax.lax.stop_gradient(streams[ds]) if dur_cfg.detach_input
                      else streams[ds])
            if dur_cfg.use_gradtts_fa:
                fa: GradTTSFA = self.predictors["durations"]
                mel = inputs.get("mel")
                if training and mel is not None:
                    durations, _, fa_losses = fa.align(
                        dur_in, token_lengths, mel, inputs.get("mel_lengths"),
                        deterministic=deterministic)
                    losses.update(fa_losses)
                    predictions["durations_fa"] = durations  # MAS durations (frames)
                else:
                    durations = fa.predict(dur_in, token_lengths,
                                           deterministic=deterministic)
                    rate = inputs.get("rate_modifier")
                    if rate is not None:
                        durations = durations / jnp.maximum(rate, 1e-3)
                    durations = jnp.round(durations)
            else:
                log_d = self.predictors["durations"](
                    dur_in, token_lengths, deterministic=deterministic)
                predictions["durations"] = log_d  # log(1+d) domain for the loss
                target_d = inputs.get("durations")
                if training and dur_cfg.use_target and target_d is not None:
                    durations = target_d
                else:
                    durations = TokenLevelDP.to_durations(log_d, token_lengths)
                    rate = inputs.get("rate_modifier")
                    if rate is not None:
                        # SSML rate: slower speech = longer tokens (divide by rate)
                        durations = durations / jnp.maximum(rate, 1e-3)
                    durations = jnp.round(durations)
            regulate = length_regulate_soft if self.soft_lr else length_regulate_hard
            for i in range(len(streams)):
                streams[i], attn = regulate(streams[i], durations, t_out)
            out_lengths = jnp.clip(durations.sum(axis=-1), 1, t_out).astype(jnp.int32)

        x = streams[0] if len(streams) == 1 else jnp.concatenate(streams, axis=-1)
        return x, out_lengths, predictions, attn, losses
