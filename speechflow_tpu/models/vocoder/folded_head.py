"""Folded (space-to-depth) inference runner for the BigVGAN-class head.

The trained ``SnakeUpsampleHead`` spends most of its time in stages with few
channels at high sample rates, which waste TPU vector lanes and MXU tiles
(see ops/folded.py and docs/vocoder_roofline.md for the measured analysis).
``FoldedSnakeHead`` rebuilds an **exact** inference equivalent from the
trained weights: once the channel count drops below ``threshold``, the
activation is kept folded as (B, T/F, F*C) with F chosen so the folded width
stays ~``target`` — constant through the remaining upsampling stack (C
halves, F doubles) — and every conv/ConvTranspose runs on an exactly
scattered folded kernel while the anti-aliased snakes run tap-for-tap in
folded space.

This is a *load-time transform*: no retraining, no approximation (float
reassociation only — validated by tests/test_folded_head.py).  It is an
``nnx.Module`` so it can replace ``Vocos.head`` in place
(``Vocos.fold_inference()``) and flow through the usual split/merge, dtype
casting, and jit machinery.  Inference-only by design; training keeps the
original module graph and autodiff path.

Reference anchor: the reference's fused CUDA anti_alias_activation kernel
(tts/vocoders/vocos/modules/heads/components/alias_free_activation/cuda)
attacks the same hot spot at the instruction level; on TPU the win is in the
data layout, so the equivalent lives here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.ops import folded as fd

__all__ = ["FoldedSnakeHead"]


def _divisor_fold(prod_rates: int, c: int, target: int) -> int:
    """Largest divisor of ``prod_rates`` with F*C <= target (>=1) — F must
    divide the cumulative upsampling so T/F stays integral for any frame
    count."""
    best = 1
    for f in range(1, prod_rates + 1):
        if prod_rates % f == 0 and f * c <= target:
            best = f
    return best


class _FoldedConv(nnx.Module):
    def __init__(self, module: nnx.Conv, F: int, dilation: int = 1):
        w = np.asarray(module.kernel[...], np.float32)
        w_f, self.pad = fd.fold_conv_kernel(w, F, dilation)
        self.w_f = nnx.Param(jnp.asarray(w_f))
        b = np.asarray(module.bias[...], np.float32)
        self.bias_f = nnx.Param(jnp.asarray(np.tile(b, F)))

    def __call__(self, xf):
        return fd.folded_conv(xf, self.w_f[...], self.pad, self.bias_f[...])


class _FoldedConvT(nnx.Module):
    def __init__(self, module: nnx.ConvTranspose, F_in: int, stride: int):
        w = np.asarray(module.kernel[...], np.float32)
        w_f, self.pad = fd.fold_conv_transpose_kernel(w, F_in, stride)
        self.w_f = nnx.Param(jnp.asarray(w_f))
        b = np.asarray(module.bias[...], np.float32)
        self.bias_f = nnx.Param(jnp.asarray(np.tile(b, stride * F_in)))

    def __call__(self, xf):
        return fd.folded_conv(xf, self.w_f[...], self.pad, self.bias_f[...])


class _FoldedSnake(nnx.Module):
    def __init__(self, act, F: int):
        self.alpha_f = nnx.Param(jnp.asarray(
            np.tile(np.asarray(act.alpha[...], np.float32), F)))
        self.beta_f = nnx.Param(jnp.asarray(
            np.tile(np.asarray(act.beta[...], np.float32), F)))
        self.taps = act.taps

    def __call__(self, xf, C: int):
        return fd.folded_anti_alias_snake(xf, self.alpha_f[...],
                                          self.beta_f[...], C, self.taps)

    def from_shared(self, y_even, y_odd, C: int):
        return fd.folded_aa_snake_downsample(y_even, y_odd, self.alpha_f[...],
                                             self.beta_f[...], C, self.taps)


class _FoldedResBlock(nnx.Module):
    def __init__(self, res, F: int, channels: int):
        self.convs = nnx.List([
            _FoldedConv(c, F, int(c.kernel_dilation[0])) for c in res.convs])
        self.acts = nnx.List([_FoldedSnake(a, F) for a in res.acts])
        self.C = channels

    def __call__(self, xf, shared_stage1=None):
        for i, (act, conv) in enumerate(zip(self.acts, self.convs)):
            a = (act.from_shared(*shared_stage1, self.C)
                 if (i == 0 and shared_stage1 is not None)
                 else act(xf, self.C))
            xf = xf + conv(a)
        return xf


class FoldedSnakeHead(nnx.Module):
    """Exact folded-inference equivalent of a trained ``SnakeUpsampleHead``.

    Stages whose channel count is below ``threshold`` run folded with width
    ~``target``; wider stages keep the original modules.  Same contract as
    the head: (B, T_frames, dim) -> (B, T_frames * prod(rates)).
    """

    def __init__(self, head, target: int = 384, threshold: int = 256):
        self.inner = head
        self.taps = head.taps
        self.total_upsample = head.total_upsample
        geom = []
        prod, f_prev = 1, 1
        ups_f, res_f = [], []
        for up, grp in zip(head.ups, head.resblocks):
            r = int(up.strides[0])
            prod *= r
            c = int(up.kernel.shape[2])
            F = 1 if c >= threshold else _divisor_fold(prod, c, target)
            if F > 1:
                ups_f.append(_FoldedConvT(up, f_prev, r))
                res_f.append(nnx.List(
                    [_FoldedResBlock(res, F, c) for res in grp]))
            geom.append((r, c, F))
            f_prev = F
        self.geom = tuple(geom)   # static per-stage (rate, channels, fold)
        self.ups_f = nnx.List(ups_f)
        self.res_f = nnx.List(res_f)
        r_last, self.c_last, self.f_last = self.geom[-1]
        if self.f_last > 1:
            self.post_act_f = _FoldedSnake(head.post_act, self.f_last)
            self.post_f = _FoldedConv(head.post, self.f_last)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        head = self.inner
        x = head.pre(x)
        k = 0
        for (r, c, F), up, grp in zip(self.geom, head.ups, head.resblocks):
            if F == 1:
                x = up(x)
                x = self._mrf(grp, x)
            else:
                # unfolded (B,T,C) input is already fold-1 phase-major; a
                # previously folded input matches the F_in the kernel was
                # scattered for — either way the ConvT emits fold r*F_in
                xf = self.ups_f[k](x)
                xf = fd.fold(fd.unfold(xf, c), F)   # refold: pure reshapes
                x = self._mrf_folded(self.res_f[k], xf, c)
                k += 1
        if self.f_last > 1:
            xf = self.post_act_f(x, self.c_last)
            xf = self.post_f(xf)                    # (B, S, F*1)
            b, s, f = xf.shape
            return jnp.tanh(xf).reshape(b, s * f)
        x = head.post(head.post_act(x))
        return jnp.tanh(x)[..., 0]

    def _mrf(self, grp, x):
        from speechflow_tpu.ops.anti_alias import aa_upsample_fir

        s1 = aa_upsample_fir(x, self.taps) if len(grp) > 1 else None
        acc = grp[0](x, shared_stage1=s1)
        for res in grp[1:]:
            acc = acc + res(x, shared_stage1=s1)
        return acc / len(grp)

    def _mrf_folded(self, grp, xf, C: int):
        s1 = (fd.folded_aa_upsample_fir(xf, C, self.taps)
              if len(grp) > 1 else None)
        acc = grp[0](xf, shared_stage1=s1)
        for res in grp[1:]:
            acc = acc + res(xf, shared_stage1=s1)
        return acc / len(grp)
