"""Fused anti-aliased snake activation — Pallas TPU kernel.

The reference ships a fused CUDA kernel for BigVGAN's anti-alias activation
(tts/vocoders/vocos/modules/heads/components/alias_free_activation/cuda/
anti_alias_activation_cuda.cu: 2x upsample-FIR -> snake-beta -> FIR ->
2x downsample, forward only, with a pure-torch fallback). The TPU-native
equivalent fuses the same three stages in one VMEM-resident Pallas kernel so
the 2x-upsampled intermediate (the bandwidth hot spot) never touches HBM.

Design: the FIR runs along time and channels are independent, so the grid
tiles (batch, channel); each program holds the full (haloed) time axis of a
128-channel slab in VMEM. The 2x upsample + even-tap SAME FIR is evaluated in
polyphase form — two phase signals at input rate built from static shifted
slices — then snake-beta, then the second FIR + decimation folds both phases
back. Exactly matches the XLA composition (`anti_alias_snake_xla`), which is
also the custom-VJP backward (the CUDA original is forward-only too).

Polyphase derivation (taps K even, XLA SAME anchoring pad_left = (K-1)//2):
  stage1: y[n] = sum_k 2 f[k] up[n+k-p],  up[2i]=x[i]
    y_even[i] = sum_{k odd}  2 f[k] x[i + (k-p)/2]
    y_odd[i]  = sum_{k even} 2 f[k] x[i + (k-p+1)/2]
  stage2+down2: out[i] = sum_k f[k] z[2i+k-p], z = snake(y)
    k odd  -> y_even[i + (k-p)/2]
    k even -> y_odd[i + (k-p-1)/2]
"""

from __future__ import annotations

import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kaiser_sinc_filter", "anti_alias_snake_xla", "anti_alias_snake_pallas",
           "anti_alias_snake", "aa_upsample_fir", "aa_snake_downsample"]


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter(cutoff: float = 0.25, half_width: float = 0.15,
                       taps: int = 12) -> np.ndarray:
    """Kaiser-windowed sinc low-pass (same design as the reference
    alias_free_activation/torch/filter.py)."""
    even = taps % 2 == 0
    half = taps // 2
    delta_f = 4 * half_width
    a = 2.285 * (half - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    t = np.arange(-half, half) + 0.5 if even else np.arange(taps) - half
    window = np.kaiser(taps, beta)
    ideal = 2 * cutoff * np.sinc(2 * cutoff * t)
    filt = ideal * window
    return (filt / filt.sum()).astype(np.float32)


def _snake(x, alpha, beta):
    # params follow the activation dtype (bf16 under mixed precision) so the
    # surrounding convs stay single-dtype
    a = jnp.exp(alpha).astype(x.dtype)
    b = jnp.exp(beta).astype(x.dtype)
    return x + (1.0 / (b + jnp.asarray(1e-9, x.dtype))) * jnp.sin(a * x) ** 2


def aa_upsample_fir(x: jnp.ndarray, taps: int = 12
                    ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Polyphase stage 1: 2x upsample + FIR, as (even, odd) phase signals at
    input rate.  Parameter-free — in an MRF group every branch's FIRST
    activation consumes the same stage input, so this can be computed once
    and shared across branches (exact, not an approximation)."""
    filt = kaiser_sinc_filter(taps=taps)  # host-side floats -> inline scalars
    t = x.shape[1]
    p = (taps - 1) // 2  # XLA SAME pad_left for the equivalent conv

    # shift(s): x[i + s] with zero padding, as a static slice of one pad
    m = taps // 2 + 1  # covers every shift used below
    xp = jnp.pad(x, ((0, 0), (m, m), (0, 0)))

    def sh(v, s):
        return jax.lax.dynamic_slice_in_dim(v, m + s, t, axis=1)

    y_even = None
    y_odd = None
    for k in range(taps):
        w = 2.0 * float(filt[k])
        if (k - p) % 2 == 0:  # odd k: even output phase
            part = w * sh(xp, (k - p) // 2)
            y_even = part if y_even is None else y_even + part
        else:
            part = w * sh(xp, (k - p + 1) // 2)
            y_odd = part if y_odd is None else y_odd + part
    return y_even, y_odd


def aa_snake_downsample(y_even: jnp.ndarray, y_odd: jnp.ndarray,
                        alpha: jnp.ndarray, beta: jnp.ndarray,
                        taps: int = 12) -> jnp.ndarray:
    """Polyphase stages 2+3: snake-beta on both phases, then FIR +
    2x decimation folding the phases back to input rate."""
    filt = kaiser_sinc_filter(taps=taps)
    t = y_even.shape[1]
    p = (taps - 1) // 2
    m = taps // 2 + 1

    def sh(v, s):
        return jax.lax.dynamic_slice_in_dim(v, m + s, t, axis=1)

    z_even = _snake(y_even, alpha, beta)
    z_odd = _snake(y_odd, alpha, beta)

    zep = jnp.pad(z_even, ((0, 0), (m, m), (0, 0)))
    zop = jnp.pad(z_odd, ((0, 0), (m, m), (0, 0)))
    out = None
    for k in range(taps):
        w = float(filt[k])
        if (k - p) % 2 == 0:
            part = w * sh(zep, (k - p) // 2)
        else:
            part = w * sh(zop, (k - p - 1) // 2)
        out = part if out is None else out + part
    return out


def anti_alias_snake_xla(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                         taps: int = 12) -> jnp.ndarray:
    """Polyphase composition of up2 + FIR -> snake -> FIR -> down2. (B, T, C).

    Mathematically identical to materializing the 2x-upsampled signal and
    running two depthwise SAME FIRs (the module docstring's derivation), but
    expressed as static shifted adds at INPUT rate: depthwise convs with
    ``feature_group_count=C`` lower poorly on TPU, and the 2T intermediate
    is pure bandwidth. Each phase is taps/2 scaled shifts of x, which XLA
    fuses into a couple of elementwise passes.
    """
    y_even, y_odd = aa_upsample_fir(x, taps)
    return aa_snake_downsample(y_even, y_odd, alpha, beta, taps)


def _aa_tile(x, alpha, beta, t_valid_lo, t_valid_hi, *, taps: int, halo: int,
             filt: tuple, t_out: int):
    """Compute one haloed tile: x (t_out + 2*halo, C) -> (t_out, C).

    ``t_valid_lo/hi`` give the tile-local row range that lies inside the real
    signal — XLA's SAME conv truncates stage-1 ringing at the signal boundary
    and stage 2 then sees zeros there; masking before the snake (snake(0)==0)
    replicates that exactly.
    """
    p = (taps - 1) // 2                # XLA SAME pad_left for even taps
    f = [float(v) for v in filt]
    margin = halo // 2
    t_mid = t_out + 2 * margin

    def sl(arr, shift, length):
        start = halo + shift  # static python int — lowers to a static slice
        return arr[start : start + length]

    y_even = jnp.zeros((t_mid, x.shape[1]), jnp.float32)
    y_odd = jnp.zeros((t_mid, x.shape[1]), jnp.float32)
    for k in range(taps):
        if (k - p) % 2 == 0:  # contributes to the even phase
            s = (k - p) // 2
            y_even = y_even + 2.0 * f[k] * sl(x, s - margin, t_mid)
        else:
            s = (k - p + 1) // 2
            y_odd = y_odd + 2.0 * f[k] * sl(x, s - margin, t_mid)

    row = jax.lax.broadcasted_iota(jnp.int32, (t_mid, 1), 0) - margin
    valid = (row >= t_valid_lo) & (row < t_valid_hi)
    y_even = jnp.where(valid, y_even, 0.0)
    y_odd = jnp.where(valid, y_odd, 0.0)

    z_even = _snake(y_even, alpha, beta)
    z_odd = _snake(y_odd, alpha, beta)

    out = jnp.zeros((t_out, x.shape[1]), jnp.float32)
    for k in range(taps):
        if (k - p) % 2 == 0:
            s = (k - p) // 2
            src = z_even
        else:
            s = (k - p - 1) // 2
            src = z_odd
        start = margin + s
        out = out + f[k] * src[start : start + t_out]
    return out


def anti_alias_snake_pallas(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                            taps: int = 12, ctile: int = 128, tile_t: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused Pallas version. x: (B, T, C); alpha/beta: (C,) log-scale params.

    Grid tiles (batch, channel slab, time tile); x stays in HBM (memory_space
    ANY) and each program DMAs its haloed time window into VMEM scratch —
    overlapping halo reads aren't expressible with BlockSpec alone.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    halo = taps
    c_pad = (-c) % ctile
    tile_t = min(tile_t, t)
    n_tt = (t + tile_t - 1) // tile_t
    t_pad = n_tt * tile_t - t
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (halo, halo + t_pad), (0, c_pad)))
    ap = jnp.pad(alpha.astype(jnp.float32), (0, c_pad))[None]  # 2D for TPU layout
    bp = jnp.pad(beta.astype(jnp.float32), (0, c_pad))[None]
    n_ct = (c + c_pad) // ctile
    filt = tuple(kaiser_sinc_filter(taps=taps).tolist())

    def kernel(x_hbm, alpha_ref, beta_ref, out_ref, scratch, sem):
        jt = pl.program_id(2)
        jc = pl.program_id(1)
        i = pl.program_id(0)
        t0 = jt * tile_t  # element offset of the tile in the padded array
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(t0, tile_t + 2 * halo), pl.ds(jc * ctile, ctile)],
            scratch, sem)
        dma.start()
        dma.wait()
        # tile-local valid range: global rows [0, T)
        lo = -t0  # global row 0 in tile-local coords (rows are global - t0)
        out_ref[0] = _aa_tile(scratch[...], alpha_ref[0], beta_ref[0],
                              lo, t - t0, taps=taps, halo=halo, filt=filt,
                              t_out=tile_t)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_ct, n_tt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, ctile), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, ctile), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, tile_t, ctile), lambda i, j, k: (i, k, j)),
        out_shape=jax.ShapeDtypeStruct((b, t + t_pad, c + c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t + 2 * halo, ctile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, ap, bp)
    return out[:, :t, :c]


@functools.lru_cache(maxsize=None)
def _make_anti_alias_snake(taps: int):
    @jax.custom_vjp
    def f(x, alpha, beta):
        return anti_alias_snake_xla(x, alpha, beta, taps)

    def fwd(x, alpha, beta):
        return f(x, alpha, beta), (x, alpha, beta)

    def bwd(res, g):
        x, alpha, beta = res
        _, vjp = jax.vjp(
            lambda *a: anti_alias_snake_xla(*a, taps=taps), x, alpha, beta)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def anti_alias_snake(x, alpha, beta, taps: int = 12, remat: bool = True):
    """Anti-aliased snake with custom VJP (one cached closure per tap count).

    ``remat=True`` (default) recomputes the forward in the backward pass
    (the custom VJP saves only (x, alpha, beta)) — right for inference-scale
    activations.  ``remat=False`` lets XLA autodiff save the phase
    intermediates instead; measured on v5e at the flagship BigVGAN GAN step
    it is only ~+3% (1.518 -> 1.566 steps/s; +taps 8: 1.745) — the backward
    is bound by intrinsic gradient work, not by the recompute (decomposition
    in docs/history.md round 4) — but the knob is free at training chunk
    sizes where the extra activation memory is negligible.

    The production default is the polyphase XLA composition: grouped
    (feature_group_count=C) depthwise convs lower poorly on TPU — at the
    bigvgan head's level-2 shape (B32 x T65536 x C64) the conv formulation
    measured ~1.3 s on v5e vs ~15 ms for the shifted-add polyphase form
    (the whole flagship snake head: 640 -> 253 ms). The Pallas tile kernel
    remains as a validated correctness-equivalent alternative.

    ``taps`` (static) sets the FIR length of both the interpolation and the
    decimation filter; the op's cost is ~linear in it (2*taps shifted FMAs
    at the 2x rate).  The filters are parameter-free, so a model trained at
    a reduced tap count loads and runs at the full 12 taps for inference
    unchanged — the knob trades train-time stopband attenuation (-41 dB
    peak at 12 taps, -27 dB at 8, -17 dB at 6; kaiser_sinc_filter) for
    training throughput.
    """
    if not remat:
        return anti_alias_snake_xla(x, alpha, beta, taps)
    return _make_anti_alias_snake(int(taps))(x, alpha, beta)
