"""Folded (space-to-depth) execution of 1-D conv stacks — TPU layout optimization.

Why this exists: the BigVGAN-class vocoder head spends most of its inference
time in stages with few channels at very high sample rates (C=24..192 at
T up to 262k).  TPU vector registers are (sublanes, 128 lanes) tiles over the
two minor dims, so a (T, 24) activation wastes 104/128 lanes in **every**
elementwise op and starves the MXU in every conv — the committed roofline
(docs/vocoder_roofline.md) measures those stages at ~10% of light speed while
HBM sits at 92 of 819 GB/s: the head is *layout*-bound, not bandwidth-bound.

The fix is classic polyphase/space-to-depth: operate on x folded as

    x_f[b, s, p*C + c] = x[b, s*F + p, c]        (phase-major fold)

which in row-major order is **the same linear memory layout** — ``fold`` /
``unfold`` are pure reshapes.  With F chosen so F*C is a multiple of 128,
every elementwise op runs at full lane utilization, and convolutions become
dense matmuls over the folded width:

* a true-time shift ``x[t+s]`` is a feature-block rotation: two static
  slices + concat (``fold_shift``) — the anti-aliased snake's polyphase FIR
  passes (ops/anti_alias.py) port tap-for-tap;
* a dilated SAME conv (kernel k, dilation d) becomes a folded conv with
  ``K' ~ ceil(((k-1)d+1)/F)+1`` taps over width F*C, whose kernel is an exact
  host-side scatter of the trained weights (``fold_conv_kernel``).  The
  scatter inflates FLOPs by ~K'F/k, but these stages run at <10% MXU
  utilization — trading idle MXU time for full tiles is the right TPU deal;
* a strided ConvTranspose (k=2r, stride r) becomes a folded conv producing
  r*F output phases (``fold_conv_transpose_kernel``) — after the fold point
  the folded width is **constant** through the whole upsampling stack
  (C halves, F doubles), so every stage sees identical, MXU-friendly shapes.

Zero-padding semantics match exactly: a folded step is F true samples, and
both the true ops (XLA SAME) and the folded convs zero-fill outside the
signal, so the transform is numerically exact up to float reassociation
(tested to ~1e-5 in f32 by tests/test_folded_head.py).

Reference anchor: this replaces the CUDA-side throughput work of the
reference's fused anti_alias_activation kernel (SURVEY §2.4) at the *layout*
level — the idiomatic TPU answer to "small-C conv stacks are slow".
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fold", "unfold", "fold_shift", "fold_conv_kernel",
           "fold_conv_transpose_kernel", "folded_conv",
           "folded_aa_upsample_fir", "folded_aa_snake_downsample",
           "folded_anti_alias_snake"]


def fold(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T/F, F*C), phase-major (a pure row-major reshape)."""
    b, t, c = x.shape
    assert t % F == 0, f"T={t} not divisible by fold factor {F}"
    return x.reshape(b, t // F, F * c)


def unfold(xf: jnp.ndarray, C: int) -> jnp.ndarray:
    """(B, S, F*C) -> (B, S*F, C) — inverse of :func:`fold`."""
    b, s, w = xf.shape
    assert w % C == 0
    return xf.reshape(b, s * (w // C), C)


def _step_shift(xf: jnp.ndarray, d: int) -> jnp.ndarray:
    """y[s] = xf[s + d], zero-filled outside — a static pad + slice."""
    if d == 0:
        return xf
    s = xf.shape[1]
    m = abs(d)
    xp = jnp.pad(xf, ((0, 0), (m, m), (0, 0)))
    return jax.lax.dynamic_slice_in_dim(xp, m + d, s, axis=1)


def fold_shift(xf: jnp.ndarray, s: int, C: int) -> jnp.ndarray:
    """True-time shift in folded space: fold(shift(x, s)) == fold_shift(fold(x), s).

    y_f[b, u, p*C + c] = x[b, u*F + p + s, c].  With s = d*F + s0 (floored),
    output phases [0, F-s0) read step u+d at phases [s0, F); phases
    [F-s0, F) read step u+d+1 at phases [0, s0) — i.e. a rotation of the
    feature axis by s0*C with carry into the next step: two static slices +
    one concat, independent of F.
    """
    F = xf.shape[2] // C
    d, s0 = s // F, s % F
    a = _step_shift(xf, d)
    if s0 == 0:
        return a
    b = _step_shift(xf, d + 1)
    return jnp.concatenate([a[:, :, s0 * C:], b[:, :, :s0 * C]], axis=2)


# --------------------------------------------------------------------------- #
#  exact folded kernels (host-side weight scatter)                            #
# --------------------------------------------------------------------------- #


def fold_conv_kernel(w: np.ndarray, F: int, dilation: int = 1
                     ) -> tp.Tuple[np.ndarray, tp.Tuple[int, int]]:
    """Fold a SAME, stride-1 conv kernel (k, C_in, C_out) for fold factor F.

    True op (XLA SAME):  y[t] = sum_j w[j] . x[t + j*d - pad_left],
    pad_left = ((k-1)*d)//2.  Output phase p at folded step u reads true
    offset o = p + j*d - pad_left, i.e. folded step u + o//F at phase o%F.

    Returns (w_f (K', F*C_in, F*C_out), (pad_lo, pad_hi)) such that

        y_f = conv(x_f, w_f, padding=[(pad_lo, pad_hi)])      # NWC/WIO
    """
    k, c_in, c_out = w.shape
    pad_left = ((k - 1) * dilation) // 2
    offs = [(p, j, p + j * dilation - pad_left)
            for p in range(F) for j in range(k)]
    dmin = min(o // F for _, _, o in offs)
    dmax = max(o // F for _, _, o in offs)
    w_f = np.zeros((dmax - dmin + 1, F * c_in, F * c_out), w.dtype)
    for p, j, o in offs:
        q, dlt = o % F, o // F
        w_f[dlt - dmin, q * c_in:(q + 1) * c_in,
            p * c_out:(p + 1) * c_out] += w[j]
    return w_f, (-dmin, dmax)


def fold_conv_transpose_kernel(w: np.ndarray, F: int, stride: int
                               ) -> tp.Tuple[np.ndarray, tp.Tuple[int, int]]:
    """Fold a SAME ConvTranspose kernel (k, C_in, C_out), stride r.

    flax/lax SAME conv_transpose (transpose_kernel=False) computes
    y[t_out] = sum_j w[j] . xd[t_out + j - pad_a] with xd the r-dilated
    input and pad_a = k-1 if r > k-1 else ceil((k + r - 2)/2).  Nonzero
    xd positions are i*r, so tap (j, p_out) contributes iff
    (p_out + j - pad_a) % r == 0, reading true input index
    u*F + o with o = (p_out + j - pad_a)//r.

    Input fold F, output fold F' = r*F (same folded step count):
    returns (w_f (K'', F*C_in, r*F*C_out), (pad_lo, pad_hi)).
    """
    k, c_in, c_out = w.shape
    r = stride
    pad_len = k + r - 2
    pad_a = k - 1 if r > k - 1 else int(np.ceil(pad_len / 2))
    f_out = r * F
    offs = []
    for p_out in range(f_out):
        for j in range(k):
            num = p_out + j - pad_a
            if num % r == 0:
                offs.append((p_out, j, num // r))
    dmin = min(o // F for _, _, o in offs)
    dmax = max(o // F for _, _, o in offs)
    w_f = np.zeros((dmax - dmin + 1, F * c_in, f_out * c_out), w.dtype)
    for p_out, j, o in offs:
        q, dlt = o % F, o // F
        w_f[dlt - dmin, q * c_in:(q + 1) * c_in,
            p_out * c_out:(p_out + 1) * c_out] += w[j]
    return w_f, (-dmin, dmax)


def folded_conv(xf: jnp.ndarray, w_f: jnp.ndarray,
                pad: tp.Tuple[int, int],
                bias_f: tp.Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply a folded kernel: (B, S, W_in) x (K', W_in, W_out) -> (B, S, W_out)."""
    y = jax.lax.conv_general_dilated(
        xf, w_f.astype(xf.dtype), window_strides=(1,), padding=[pad],
        dimension_numbers=("NWC", "WIO", "NWC"))
    if bias_f is not None:
        y = y + bias_f.astype(y.dtype)
    return y


# --------------------------------------------------------------------------- #
#  folded anti-aliased snake (port of ops/anti_alias.py polyphase form)       #
# --------------------------------------------------------------------------- #


def folded_aa_upsample_fir(xf: jnp.ndarray, C: int, taps: int = 12
                           ) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded port of ops.anti_alias.aa_upsample_fir — same tap derivation,
    true-time shifts via :func:`fold_shift`."""
    from speechflow_tpu.ops.anti_alias import kaiser_sinc_filter

    filt = kaiser_sinc_filter(taps=taps)
    p = (taps - 1) // 2
    y_even = None
    y_odd = None
    for k in range(taps):
        w = 2.0 * float(filt[k])
        if (k - p) % 2 == 0:
            part = w * fold_shift(xf, (k - p) // 2, C)
            y_even = part if y_even is None else y_even + part
        else:
            part = w * fold_shift(xf, (k - p + 1) // 2, C)
            y_odd = part if y_odd is None else y_odd + part
    return y_even, y_odd


def folded_aa_snake_downsample(y_even: jnp.ndarray, y_odd: jnp.ndarray,
                               alpha_f: jnp.ndarray, beta_f: jnp.ndarray,
                               C: int, taps: int = 12) -> jnp.ndarray:
    """Folded port of ops.anti_alias.aa_snake_downsample.

    ``alpha_f``/``beta_f`` are the per-channel log-params tiled F times
    (phase-major: jnp.tile matches the p*C + c feature order).
    """
    from speechflow_tpu.ops.anti_alias import _snake, kaiser_sinc_filter

    filt = kaiser_sinc_filter(taps=taps)
    p = (taps - 1) // 2
    z_even = _snake(y_even, alpha_f, beta_f)
    z_odd = _snake(y_odd, alpha_f, beta_f)
    out = None
    for k in range(taps):
        w = float(filt[k])
        if (k - p) % 2 == 0:
            part = w * fold_shift(z_even, (k - p) // 2, C)
        else:
            part = w * fold_shift(z_odd, (k - p - 1) // 2, C)
        out = part if out is None else out + part
    return out


def folded_anti_alias_snake(xf: jnp.ndarray, alpha_f: jnp.ndarray,
                            beta_f: jnp.ndarray, C: int,
                            taps: int = 12) -> jnp.ndarray:
    """Folded equivalent of ops.anti_alias.anti_alias_snake_xla (inference)."""
    y_even, y_odd = folded_aa_upsample_fir(xf, C, taps)
    return folded_aa_snake_downsample(y_even, y_odd, alpha_f, beta_f, C, taps)
