"""Autoregressive decoders: Tacotron2-style attention decoder and XTTS-style GPT.

Capability parity with the reference AR families
(tts/acoustic_models/modules/components/decoders/{taco_decoder, xtts_decoder
:34} + modules/tacotron2 LSA attention + common/gpts/gpt_acoustic.py:34 GPTA):

* ``TacoDecoder`` — location-sensitive attention (LSA) decoder: a GRU step
  consuming prenet(prev frame) + attention context; attention energies combine
  content terms with a conv over cumulative attention weights. Training is
  teacher-forced through one ``lax.scan`` over frames (sequential but
  compiled); inference is the same scan feeding back predictions with a gate
  stop tracked via masking (static max length — TPU-friendly).

* ``GPTDecoder`` — causal transformer over [text tokens ; BOS ; acoustic
  codes]: teacher-forced training is one parallel causal pass (full MXU
  utilization); sampling uses a fixed-length scan with an explicit KV cache
  carried through the scan (static shapes).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.models.tts.common import rope_rotate
from speechflow_tpu.utils.masks import sequence_mask

__all__ = ["TacoDecoder", "GPTDecoder", "RetentionBlock"]


class LSAttention(nnx.Module):
    """Location-sensitive attention (reference: modules/tacotron2 LSA)."""

    def __init__(self, query_dim: int, memory_dim: int, attn_dim: int = 128,
                 n_filters: int = 32, kernel_size: int = 31, rngs: nnx.Rngs = None):
        rngs = rngs or nnx.Rngs(0)
        self.query_proj = nnx.Linear(query_dim, attn_dim, use_bias=False, rngs=rngs)
        self.memory_proj = nnx.Linear(memory_dim, attn_dim, use_bias=False, rngs=rngs)
        self.loc_conv = nnx.Conv(2, n_filters, (kernel_size,), padding="SAME",
                                 use_bias=False, rngs=rngs)
        self.loc_proj = nnx.Linear(n_filters, attn_dim, use_bias=False, rngs=rngs)
        self.v = nnx.Linear(attn_dim, 1, use_bias=False, rngs=rngs)

    def __call__(self, query, memory_proj, memory, attn_state, mask):
        """query (B, Dq); attn_state (B, N, 2) = [prev_attn, cum_attn]."""
        loc = self.loc_proj(self.loc_conv(attn_state))
        e = self.v(jnp.tanh(self.query_proj(query)[:, None] + memory_proj + loc))[..., 0]
        e = jnp.where(mask, e, -1e9)
        attn = jax.nn.softmax(e, axis=-1)
        context = jnp.einsum("bn,bnd->bd", attn, memory)
        return context, attn


class TacoDecoder(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, dim: int = 512,
                 prenet_dim: int = 256, attn_dim: int = 128,
                 prenet_dropout: float = 0.5, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.pre1 = nnx.Linear(dim_out, prenet_dim, rngs=rngs)
        self.pre2 = nnx.Linear(prenet_dim, prenet_dim, rngs=rngs)
        self.prenet_dropout = prenet_dropout
        self.attn = LSAttention(dim, dim_in, attn_dim, rngs=rngs)
        self.cell = nnx.GRUCell(prenet_dim + dim_in, dim, rngs=rngs)
        self.frame_proj = nnx.Linear(dim + dim_in, dim_out, rngs=rngs)
        self.gate_proj = nnx.Linear(dim + dim_in, 1, rngs=rngs)
        self.dim = dim
        self.prenet_dim = prenet_dim
        self.dim_out = dim_out
        self.rngs = rngs

    def _prenet(self, x, masks):
        """Prenet with pre-drawn dropout masks (RNG draws can't live inside
        lax.scan — nnx would mutate its counter across trace levels)."""
        m1, m2 = masks
        h = nnx.relu(self.pre1(x)) * m1
        return nnx.relu(self.pre2(h)) * m2

    def _drop_masks(self, t, b, deterministic):
        if deterministic or self.prenet_dropout <= 0:
            ones = jnp.ones((t, b, self.prenet_dim))
            return ones, ones
        keep = 1.0 - self.prenet_dropout
        k1, k2 = jax.random.split(self.rngs.params())
        m1 = jax.random.bernoulli(k1, keep, (t, b, self.prenet_dim)) / keep
        m2 = jax.random.bernoulli(k2, keep, (t, b, self.prenet_dim)) / keep
        return m1.astype(jnp.float32), m2.astype(jnp.float32)

    def _scan(self, memory, memory_lengths, frames_in, deterministic):
        """frames_in: (B, T, dim_out) inputs per step (teacher or feedback)."""
        b, n, _ = memory.shape
        t = frames_in.shape[1]
        mask = sequence_mask(memory_lengths, n)
        memory_proj = self.attn.memory_proj(memory)
        masks = self._drop_masks(t, b, deterministic)

        def step(carry, xs):
            x_t, m1, m2 = xs
            h, attn_state = carry
            pre = self._prenet(x_t, (m1, m2))
            context, attn = self.attn(h, memory_proj, memory, attn_state, mask)
            h, _ = self.cell(h, jnp.concatenate([pre, context], axis=-1))
            hc = jnp.concatenate([h, context], axis=-1)
            frame = self.frame_proj(hc)
            gate = self.gate_proj(hc)[..., 0]
            new_state = jnp.stack([attn, attn_state[..., 1] + attn], axis=-1)
            return (h, new_state), (frame, gate, attn)

        h0 = jnp.zeros((b, self.dim))
        a0 = jnp.zeros((b, n, 2)).at[:, 0, 0].set(1.0)
        (_, _), (frames, gates, attns) = jax.lax.scan(
            step, (h0, a0), (jnp.moveaxis(frames_in, 1, 0), masks[0], masks[1]))
        return (jnp.moveaxis(frames, 0, 1), jnp.moveaxis(gates, 0, 1),
                jnp.moveaxis(attns, 0, 1))

    def __call__(self, memory, memory_lengths, target_frames,
                 deterministic=True):
        """Teacher-forced: inputs are shifted targets (go-frame prepended)."""
        go = jnp.zeros_like(target_frames[:, :1])
        frames_in = jnp.concatenate([go, target_frames[:, :-1]], axis=1)
        return self._scan(memory, memory_lengths, frames_in, deterministic)

    def generate(self, memory, memory_lengths, max_frames: int = 1024):
        """Feedback decoding with a static frame budget; returns gate logits
        for the caller to trim at sigmoid(gate) > 0.5."""
        b, n, _ = memory.shape
        mask = sequence_mask(memory_lengths, n)
        memory_proj = self.attn.memory_proj(memory)

        ones = jnp.ones((self.prenet_dim,))

        def step(carry, _):
            h, attn_state, prev = carry
            pre = self._prenet(prev, (ones, ones))
            context, attn = self.attn(h, memory_proj, memory, attn_state, mask)
            h, _ = self.cell(h, jnp.concatenate([pre, context], axis=-1))
            hc = jnp.concatenate([h, context], axis=-1)
            frame = self.frame_proj(hc)
            gate = self.gate_proj(hc)[..., 0]
            new_state = jnp.stack([attn, attn_state[..., 1] + attn], axis=-1)
            return (h, new_state, frame), (frame, gate)

        h0 = jnp.zeros((b, self.dim))
        a0 = jnp.zeros((b, n, 2)).at[:, 0, 0].set(1.0)
        prev0 = jnp.zeros((b, self.dim_out))
        _, (frames, gates) = jax.lax.scan(step, (h0, a0, prev0), None,
                                          length=max_frames)
        return jnp.moveaxis(frames, 0, 1), jnp.moveaxis(gates, 0, 1)


class CausalBlock(nnx.Module):
    """Pre-norm causal self-attention block with explicit q/k/v projections so
    sampling can carry a KV cache through a scan (the reference GPTA streams
    AR inference the same way, common/gpts/gpt_acoustic.py:34)."""

    def __init__(self, dim: int, n_heads: int, rngs: nnx.Rngs):
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.q = nnx.Linear(dim, dim, rngs=rngs)
        self.k = nnx.Linear(dim, dim, rngs=rngs)
        self.v = nnx.Linear(dim, dim, rngs=rngs)
        self.o = nnx.Linear(dim, dim, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.ff1 = nnx.Linear(dim, 4 * dim, rngs=rngs)
        self.ff2 = nnx.Linear(4 * dim, dim, rngs=rngs)

    def _qkv(self, x, positions=None):
        b, t, _ = x.shape
        h = rope_rotate(self.norm1(x), positions=positions)
        shape = (b, t, self.n_heads, self.head_dim)
        return (self.q(h).reshape(shape), self.k(h).reshape(shape),
                self.v(h).reshape(shape))

    def _attend(self, q, k, v, mask):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(self.head_dim)
        scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        b, t = q.shape[:2]
        return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, -1)

    def _ff(self, x):
        return x + self.ff2(nnx.gelu(self.ff1(self.norm2(x))))

    def __call__(self, x, mask):
        q, k, v = self._qkv(x)
        return self._ff(x + self.o(self._attend(q, k, v, mask)))

    # -- KV-cached decoding --------------------------------------------------

    def init_cache(self, b: int, max_len: int, dtype=jnp.float32):
        shape = (b, max_len, self.n_heads, self.head_dim)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def prefill(self, x, cache, valid=None):
        """Parallel causal pass over the prefix; fills cache[:, :t].
        ``valid`` (B, t) optionally masks padded prefix keys (e.g. a padded
        audio prompt) out of attention."""
        t = x.shape[1]
        q, k, v = self._qkv(x)
        k_c = jax.lax.dynamic_update_slice_in_dim(cache[0], k, 0, axis=1)
        v_c = jax.lax.dynamic_update_slice_in_dim(cache[1], v, 0, axis=1)
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        if valid is not None:
            mask = mask & valid[:, None, None, :t]
        return self._ff(x + self.o(self._attend(q, k, v, mask))), (k_c, v_c)

    def decode_step(self, x_t, cache, pos, valid=None):
        """One token: x_t (B, 1, D) at absolute position ``pos`` (traced).
        ``valid`` (B, max_len) masks padded prefix keys."""
        q, k, v = self._qkv(x_t, positions=jnp.asarray(pos)[None])
        k_c = jax.lax.dynamic_update_slice_in_dim(cache[0], k, pos, axis=1)
        v_c = jax.lax.dynamic_update_slice_in_dim(cache[1], v, pos, axis=1)
        kv_mask = (jnp.arange(k_c.shape[1]) <= pos)[None, None, None, :]
        if valid is not None:
            kv_mask = kv_mask & valid[:, None, None, :]
        return self._ff(x_t + self.o(self._attend(q, k_c, v_c, kv_mask))), (k_c, v_c)


class GPTDecoder(nnx.Module):
    """Causal LM over [text ; (BOA ; audio-prompt) ; BOS ; acoustic codes]
    (XTTS-style GPTA).  With ``prompt_dim`` set, a reference-audio prompt —
    already encoded to model-dim frames by the caller's conditioning encoder —
    is prefixed between text and BOS behind a learned BOA token, giving the
    zero-shot voice-cloning conditioning of the reference
    (xtts_decoder.py:94-104, gpt_acoustic.py:206-246 prepare_prompt_audio)."""

    def __init__(self, n_text_tokens: int = 256, n_audio_tokens: int = 1026,
                 dim: int = 512, n_layers: int = 8, n_heads: int = 8,
                 cond_dim: tp.Optional[int] = None, block_type: str = "attention",
                 use_prompt: bool = False, rngs: nnx.Rngs = None, **kw):
        rngs = rngs or nnx.Rngs(0)
        self.text_emb = nnx.Embed(n_text_tokens, dim, rngs=rngs)
        self.audio_emb = nnx.Embed(n_audio_tokens, dim, rngs=rngs)
        block = RetentionBlock if block_type == "retention" else CausalBlock
        self.blocks = nnx.List([block(dim, n_heads, rngs) for _ in range(n_layers)])
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.head = nnx.Linear(dim, n_audio_tokens, rngs=rngs)
        self.cond_proj = nnx.Linear(cond_dim, dim, rngs=rngs) if cond_dim else None
        # learned begin-of-audio-prompt token (reference service_tokens["boa"])
        self.boa_tok = (nnx.Param(jax.random.normal(rngs.params(), (1, 1, dim)) * 0.02)
                        if use_prompt else None)
        self.n_audio_tokens = n_audio_tokens
        self.bos = n_audio_tokens - 2
        self.eos = n_audio_tokens - 1

    def _prefix(self, text_ids, prompt_emb=None, prompt_lengths=None):
        """[text ; BOA ; prompt] embeddings + per-key validity (B, L)."""
        t_emb = self.text_emb(text_ids)
        b, t_text = text_ids.shape
        parts, valids = [t_emb], [jnp.ones((b, t_text), bool)]
        if prompt_emb is not None:
            if self.boa_tok is None:
                raise ValueError("GPTDecoder built without use_prompt=True")
            boa = jnp.broadcast_to(self.boa_tok[...], (b, 1, t_emb.shape[-1]))
            parts += [boa, prompt_emb]
            pv = (sequence_mask(prompt_lengths, prompt_emb.shape[1])
                  if prompt_lengths is not None
                  else jnp.ones((b, prompt_emb.shape[1]), bool))
            valids += [jnp.ones((b, 1), bool), pv]
        return jnp.concatenate(parts, axis=1), jnp.concatenate(valids, axis=1)

    def _trunk(self, text_ids, audio_ids, cond=None, prompt_emb=None,
               prompt_lengths=None):
        prefix, pvalid = self._prefix(text_ids, prompt_emb, prompt_lengths)
        a_emb = self.audio_emb(audio_ids)
        x = jnp.concatenate([prefix, a_emb], axis=1)
        valid = jnp.concatenate(
            [pvalid, jnp.ones((x.shape[0], a_emb.shape[1]), bool)], axis=1)
        if self.cond_proj is not None and cond is not None:
            x = x + self.cond_proj(cond)[:, None, :]
        l = x.shape[1]
        mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        if prompt_emb is not None and prompt_lengths is not None:
            mask = mask & valid[:, None, None, :]
        for blk in self.blocks:
            x = blk(x, mask)
        return self.head(self.norm(x))

    def __call__(self, text_ids, audio_ids, cond=None, prompt_emb=None,
                 prompt_lengths=None):
        """Teacher-forced logits for audio positions: predicts audio_ids[t]
        from [text ; (BOA ; prompt) ; BOS ; audio_ids[:t]]."""
        b = audio_ids.shape[0]
        bos = jnp.full((b, 1), self.bos, jnp.int32)
        inputs = jnp.concatenate([bos, audio_ids[:, :-1]], axis=1)
        logits = self._trunk(text_ids, inputs, cond, prompt_emb, prompt_lengths)
        return logits[:, -audio_ids.shape[1]:]  # logits over audio positions

    def loss(self, text_ids, audio_ids, audio_lengths, cond=None,
             prompt_emb=None, prompt_lengths=None):
        import optax

        logits = self(text_ids, audio_ids, cond, prompt_emb, prompt_lengths)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, audio_ids)
        mask = sequence_mask(audio_lengths, audio_ids.shape[1]).astype(ce.dtype)
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def _sample(self, logits, key, temperature: float):
        if temperature > 0:
            return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def generate(self, text_ids, max_tokens: int = 256, temperature: float = 0.8,
                 key=None, cond=None, prompt_emb=None, prompt_lengths=None):
        """KV-cached sampling: one parallel prefill over
        [text ; (BOA ; prompt) ; BOS] fills the per-layer caches, then a
        ``lax.scan`` decodes one token per step with O(1) trunk work (static
        shapes; reference GPTA streaming inference, gpt_acoustic.py:34)."""
        b, t_text = text_ids.shape
        key = key if key is not None else jax.random.PRNGKey(0)

        cond_emb = (self.cond_proj(cond)[:, None, :]
                    if self.cond_proj is not None and cond is not None else None)

        def embed_audio(ids):
            e = self.audio_emb(ids)
            return e + cond_emb if cond_emb is not None else e

        # prefill the prefix [text ; (BOA ; prompt) ; BOS]
        prefix, pvalid = self._prefix(text_ids, prompt_emb, prompt_lengths)
        x = jnp.concatenate(
            [prefix, self.audio_emb(jnp.full((b, 1), self.bos, jnp.int32))],
            axis=1)
        if cond_emb is not None:
            x = x + cond_emb
        t_prefix = x.shape[1]  # text + (1 + P) + BOS
        l_max = t_prefix + max_tokens
        valid = jnp.concatenate(
            [pvalid, jnp.ones((b, 1 + max_tokens), bool)], axis=1)
        need_valid = prompt_emb is not None and prompt_lengths is not None
        caches = []
        for blk in self.blocks:
            x, cache = blk.prefill(x, blk.init_cache(b, l_max),
                                   valid=valid if need_valid else None)
            caches.append(cache)
        logits0 = self.head(self.norm(x[:, -1]))

        tokens = jnp.full((b, max_tokens), self.eos, jnp.int32)
        key, sub = jax.random.split(key)
        tok0 = self._sample(logits0, sub, temperature)
        tokens = tokens.at[:, 0].set(tok0)

        def step(carry, i):
            tokens, prev, caches, key = carry
            # audio token i-1 sits at absolute position t_prefix + (i-1)
            x = embed_audio(prev[:, None])
            pos = t_prefix - 1 + i
            new_caches = []
            for blk, cache in zip(self.blocks, caches):
                x, c = blk.decode_step(x, cache, pos,
                                       valid=valid if need_valid else None)
                new_caches.append(c)
            logits = self.head(self.norm(x[:, 0]))
            key, sub = jax.random.split(key)
            nxt = self._sample(logits, sub, temperature)
            tokens = tokens.at[:, i].set(nxt)
            return (tokens, nxt, tuple(new_caches), key), None

        (tokens, _, _, _), _ = jax.lax.scan(
            step, (tokens, tok0, tuple(caches), key), jnp.arange(1, max_tokens))
        return tokens

    def generate_naive(self, text_ids, max_tokens: int = 256,
                       temperature: float = 0.8, key=None, cond=None,
                       prompt_emb=None, prompt_lengths=None):
        """O(T^2) sampling that re-runs the full trunk per step — kept as the
        parity/benchmark reference for the KV-cached ``generate``."""
        b = text_ids.shape[0]
        key = key if key is not None else jax.random.PRNGKey(0)
        tokens = jnp.full((b, max_tokens), self.eos, jnp.int32)

        def step(carry, i):
            tokens, key = carry
            bos = jnp.full((b, 1), self.bos, jnp.int32)
            inputs = jnp.concatenate([bos, tokens[:, :-1]], axis=1)
            logits = self._trunk(text_ids, inputs, cond, prompt_emb,
                                 prompt_lengths)[:, -max_tokens:]
            step_logits = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0]
            key, sub = jax.random.split(key)
            nxt = self._sample(step_logits, sub, temperature)
            tokens = tokens.at[:, i].set(nxt)
            return (tokens, key), None

        (tokens, _), _ = jax.lax.scan(step, (tokens, key), jnp.arange(max_tokens))
        return tokens


class RetentionBlock(nnx.Module):
    """Multi-scale retention block (RetNet; reference: common/gpts/retentive.py
    option for the XTTS decoder). Parallel form: out_h = (Q K^T ⊙ D_h) V with
    decay D_h[n, m] = γ_h^(n-m) for n >= m — causal by construction, O(T²)
    training like attention but with recurrent O(1) inference available."""

    def __init__(self, dim: int, n_heads: int, rngs: nnx.Rngs):
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.q = nnx.Linear(dim, dim, rngs=rngs)
        self.k = nnx.Linear(dim, dim, rngs=rngs)
        self.v = nnx.Linear(dim, dim, rngs=rngs)
        self.g = nnx.Linear(dim, dim, rngs=rngs)
        self.out = nnx.Linear(dim, dim, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.gnorm = nnx.GroupNorm(dim, num_groups=n_heads, rngs=rngs)
        self.ff1 = nnx.Linear(dim, 4 * dim, rngs=rngs)
        self.ff2 = nnx.Linear(4 * dim, dim, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        # per-head decay gammas (RetNet: 1 - 2^(-5-h))
        self.gammas = tuple(1.0 - 2.0 ** (-5.0 - h) for h in range(n_heads))

    def _qkv(self, x, positions=None):
        b, t, _ = x.shape
        h = self.norm(x)
        shape = (b, t, self.n_heads, self.head_dim)
        q = rope_rotate(self.q(h), positions=positions).reshape(shape)
        k = rope_rotate(self.k(h), positions=positions).reshape(shape)
        v = self.v(h).reshape(shape)
        return h, q, k, v

    def _mix(self, x, h, o):
        b, t = x.shape[:2]
        # per-token group norm: fold time into batch, else statistics would
        # span the sequence and the parallel/recurrent forms would diverge
        # (reference retentive.py:421-426 does the same fold)
        o = self.gnorm(o.reshape(b * t, -1)).reshape(b, t, -1)
        o = o * jax.nn.silu(self.g(h))
        x = x + self.out(o)
        return x + self.ff2(nnx.gelu(self.ff1(self.norm2(x))))

    def __call__(self, x, mask=None):
        b, t, d = x.shape
        h, q, k, v = self._qkv(x)
        n = jnp.arange(t)
        rel = n[:, None] - n[None, :]  # n - m
        # retention is linear in V, so padded keys are removed exactly by
        # zeroing their score contribution (mask is (B|1, 1, t, t) boolean,
        # causality already lives in the decay)
        key_mask = None
        if mask is not None:
            key_mask = mask[:, 0].astype(jnp.float32)  # (B|1, t, t)
        outs = []
        for head, gamma in enumerate(self.gammas):
            decay = jnp.where(rel >= 0, gamma ** rel.astype(jnp.float32), 0.0)
            scores = jnp.einsum("btd,bsd->bts", q[:, :, head], k[:, :, head])
            scores = scores * decay[None] / np.sqrt(self.head_dim)
            if key_mask is not None:
                scores = scores * key_mask
            outs.append(jnp.einsum("bts,bsd->btd", scores, v[:, :, head]))
        o = jnp.stack(outs, axis=2)
        return self._mix(x, h, o)

    # -- recurrent decoding (RetNet O(1) inference form) -----------------------

    def init_cache(self, b: int, max_len: int, dtype=jnp.float32):
        return jnp.zeros((b, self.n_heads, self.head_dim, self.head_dim), dtype)

    def prefill(self, x, cache, valid=None):
        """Parallel pass over the prefix; returns the recurrent state
        S = sum_m gamma^(t-1-m) k_m (x) v_m so decoding can continue from it.
        ``valid`` (B, t) drops padded prefix positions from the state."""
        t = x.shape[1]
        h, q, k, v = self._qkv(x)
        if valid is not None:
            k = k * valid[:, :t, None, None].astype(k.dtype)
        gammas = jnp.asarray(self.gammas, jnp.float32)  # (H,)
        w = gammas[:, None] ** (t - 1 - jnp.arange(t)).astype(jnp.float32)[None, :]
        state = jnp.einsum("ht,bthd,bthe->bhde", w, k, v)
        mask = None
        if valid is not None:
            mask = (jnp.tril(jnp.ones((t, t), bool))[None, None]
                    & valid[:, None, None, :t])
        return self.__call__(x, mask), state

    def decode_step(self, x_t, cache, pos, valid=None):
        """One token: S <- gamma*S + k (x) v; out = q S / sqrt(d)."""
        h, q, k, v = self._qkv(x_t, positions=jnp.asarray(pos)[None])
        gammas = jnp.asarray(self.gammas, jnp.float32)
        state = cache * gammas[None, :, None, None] + jnp.einsum(
            "bhd,bhe->bhde", k[:, 0], v[:, 0])
        o = jnp.einsum("bhd,bhde->bhe", q[:, 0], state)[:, None] / np.sqrt(self.head_dim)
        return self._mix(x_t, h, o), state
