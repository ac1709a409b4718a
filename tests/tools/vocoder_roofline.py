"""Per-stage roofline of the flagship BigVGAN vocoder at inference dims.

r4 VERDICT weak #4: flagship vocoder inference sits at 11.7% MFU vs 53% for
the acoustic model, with no committed analysis saying whether that's leaving
MXU time on the table or the head is genuinely bandwidth-bound at production
dims.  This script answers that with numbers:

  * analytic FLOPs and *minimum* HBM traffic per pipeline stage (backbone,
    ConvT upsamples, MRF resblock groups) at the bench shapes
    (B=32 x 1024 frames x hop 256 = 10.9 s of 24 kHz audio per utterance),
  * light-speed time per stage = max(FLOPs / peak_bf16, bytes / peak_BW),
  * measured time per stage (each stage jitted in isolation on its real
    input shape), and the whole generator end-to-end.

Output: a table + verdict, committed to docs/vocoder_roofline.md.

Run: PYTHONPATH=. python tests/tools/vocoder_roofline.py
"""

from __future__ import annotations

import sys
import time
import typing as tp
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

PEAK_FLOPS = 197e12   # v5e bf16 MXU peak (same constant as bench.py)
PEAK_BW = 819e9       # v5e HBM GB/s

BATCH = 32
T_FRAMES = 1024
N_MELS = 100


def fmt_bytes(b: float) -> str:
    return f"{b / 1e9:.2f} GB"


def stage_rows(dim: int, channels: int, rates: tp.Sequence[int],
               res_kernels: tp.Sequence[int], n_layers: int,
               taps: int = 12) -> tp.List[dict]:
    """Analytic FLOPs + minimum HBM bytes per stage (bf16 = 2 B/elem).

    "Minimum bytes" assumes perfect fusion: each conv reads its input once
    and writes its output once; the anti-aliased snake's two FIR passes are
    shifted adds XLA fuses, but their intermediates still traverse HBM once
    each at input rate x2 phases (measured behavior of the shifted-add
    lowering — see ops/anti_alias.py docstring)."""
    rows = []
    B = BATCH

    # Vocos ConvNeXt backbone at frame rate: per layer dwconv(7) +
    # pw(dim->3dim) + pw(3dim->dim)  [ops/..backbone]
    T = T_FRAMES
    f_back = n_layers * (2 * B * T * 7 * dim          # depthwise
                         + 2 * B * T * dim * 3 * dim * 2)  # two pointwise
    f_back += 2 * B * T * N_MELS * dim                # embed conv (k=7 folded)
    by_back = n_layers * 4 * (B * T * dim * 2) + 2 * (B * T * dim * 2)
    rows.append(dict(name=f"backbone convnext x{n_layers} (T={T}, C={dim})",
                     flops=f_back, bytes=by_back))

    # head pre-conv dim -> channels, k=7, frame rate
    rows.append(dict(name=f"head pre (T={T}, {dim}->{channels})",
                     flops=2 * B * T * 7 * dim * channels,
                     bytes=(B * T * dim + B * T * channels) * 2))

    ch = channels
    for i, r in enumerate(rates):
        k = 2 * r
        T_out = T * r
        ch_out = ch // 2
        # ConvT ch -> ch/2, kernel 2r, stride r
        f_up = 2 * (B * T) * k * ch * ch_out
        by_up = (B * T * ch + B * T_out * ch_out) * 2
        rows.append(dict(name=f"up{i} convT r={r} (T={T}->{T_out}, {ch}->{ch_out})",
                         flops=f_up, bytes=by_up))
        # MRF: len(res_kernels) parallel ResBlocks, each 3 dilated convs +
        # 3 AA snakes at T_out, ch_out channels
        f_conv = len(res_kernels) * sum(
            3 * 2 * B * T_out * ks * ch_out * ch_out for ks in [1])  # placeholder
        f_conv = sum(3 * 2 * B * T_out * ks * ch_out * ch_out
                     for ks in res_kernels)
        # snake: ~taps mults/elem x2 phases (up-FIR) + snake (4 ops) + down-FIR
        n_snakes = 3 * len(res_kernels)
        f_snake = n_snakes * B * T_out * ch_out * (2 * taps + 8)
        # bytes: per conv r+w; per snake r+w of 2-phase intermediate (x2)
        by_conv = 3 * len(res_kernels) * 2 * (B * T_out * ch_out * 2)
        by_snake = n_snakes * 4 * (B * T_out * ch_out * 2)
        rows.append(dict(
            name=f"mrf{i} {len(res_kernels)}xResBlock k={list(res_kernels)} "
                 f"(T={T_out}, C={ch_out})",
            flops=f_conv + f_snake, bytes=by_conv + by_snake))
        T, ch = T_out, ch_out

    # post: snake + conv ch->1 k=7 + tanh
    rows.append(dict(name=f"post (T={T}, C={ch})",
                     flops=2 * B * T * 7 * ch + B * T * ch * (2 * taps + 8),
                     bytes=6 * B * T * ch * 2))
    return rows


def light_speed(row: dict) -> float:
    return max(row["flops"] / PEAK_FLOPS, row["bytes"] / PEAK_BW)


def _sync(out) -> None:
    """block_until_ready is a no-op on the axon remote backend (bench.py:567)
    — a small numpy fetch is the only trustworthy completion barrier."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:8])


def measure(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from speechflow_tpu.io import Config
    from speechflow_tpu.models.vocoder import Vocos, VocosParams

    vsel = sys.argv[1] if len(sys.argv) > 1 else "default"
    v = Config.create_from_file(REPO / "configs" / "vocoder_bigvgan.yml",
                                value_select=[vsel]).section("model").to_dict()
    v = dict(v, feature_extractor="audio", input_feature="mel", n_mels=N_MELS)
    params = VocosParams.create(v)
    vocoder = Vocos(params, rngs=nnx.Rngs(1))
    v_def, v_state = nnx.split(vocoder)
    v_state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, v_state)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(BATCH, T_FRAMES, N_MELS)), jnp.bfloat16)

    # ---- measured, stage by stage ------------------------------------------
    def run_backbone(v_state, mel):
        return nnx.merge(v_def, v_state).backbone(mel, None)

    feats = jax.jit(run_backbone)(v_state, mel)
    head = vocoder.head

    def head_pre(v_state, x):
        return nnx.merge(v_def, v_state).head.pre(x)

    xs = [jax.jit(head_pre)(v_state, feats)]
    ups, mrfs = [], []
    x = xs[0]
    for i in range(len(head.ups)):
        def up_i(v_state, x, i=i):
            return nnx.merge(v_def, v_state).head.ups[i](x)

        def mrf_i(v_state, x, i=i):
            from speechflow_tpu.ops.anti_alias import aa_upsample_fir

            h = nnx.merge(v_def, v_state).head
            grp = h.resblocks[i]
            s1 = aa_upsample_fir(x, h.taps) if len(grp) > 1 else None
            acc = grp[0](x, shared_stage1=s1)
            for res in grp[1:]:
                acc = acc + res(x, shared_stage1=s1)
            return acc / len(grp)

        ju, jm = jax.jit(up_i), jax.jit(mrf_i)
        y = ju(v_state, x)
        ups.append((ju, x))
        mrfs.append((jm, y))
        x = jm(v_state, y)

    def post_fn(v_state, x):
        h = nnx.merge(v_def, v_state).head
        return jnp.tanh(h.post(h.post_act(x)))[..., 0]

    def full(v_state, mel):
        return nnx.merge(v_def, v_state)({"mel": mel})

    # folded-inference variant (models/vocoder/folded_head.py): same weights,
    # space-to-depth layout for the small-channel stages
    folded = Vocos(params, rngs=nnx.Rngs(1))
    folded.fold_inference()
    f_def, f_state = nnx.split(folded)
    f_state = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, f_state)

    def full_folded(f_state, mel):
        return nnx.merge(f_def, f_state)({"mel": mel})

    measured = [("backbone", measure(jax.jit(run_backbone), v_state, mel)),
                ("head pre", measure(jax.jit(head_pre), v_state, feats))]
    for i, ((ju, xu), (jm, xm)) in enumerate(zip(ups, mrfs)):
        measured.append((f"up{i}", measure(ju, v_state, xu)))
        measured.append((f"mrf{i}", measure(jm, v_state, xm)))
    measured.append(("post", measure(jax.jit(post_fn), v_state, x)))
    t_full = measure(jax.jit(full), v_state, mel)
    t_folded = measure(jax.jit(full_folded), f_state, mel)
    mel1 = mel[:1]
    t_b1 = measure(jax.jit(full), v_state, mel1)
    t_b1_folded = measure(jax.jit(full_folded), f_state, mel1)

    # ---- analytic ----------------------------------------------------------
    rows = stage_rows(v["dim"], v["upsample_channels"], v["upsample_rates"],
                      v["resblock_kernel_sizes"], v["n_layers"])

    total_f = sum(r["flops"] for r in rows)
    total_b = sum(r["bytes"] for r in rows)
    total_ls = sum(light_speed(r) for r in rows)

    print(f"\n{'stage':<46}{'GFLOP':>9}{'GB':>8}{'light ms':>10}"
          f"{'meas ms':>9}{'eff%':>6}  bound")
    audio_s = BATCH * T_FRAMES * 256 / params.sample_rate
    for r, (name, sec) in zip(rows, measured):
        ls = light_speed(r)
        bound = "BW " if r["bytes"] / PEAK_BW > r["flops"] / PEAK_FLOPS else "MXU"
        print(f"{r['name']:<46}{r['flops'] / 1e9:>9.1f}{r['bytes'] / 1e9:>8.3f}"
              f"{ls * 1e3:>10.3f}{sec * 1e3:>9.3f}{100 * ls / sec:>6.1f}  {bound}")
    print(f"\n{'TOTAL (sum of stages)':<46}{total_f / 1e9:>9.1f}"
          f"{total_b / 1e9:>8.3f}{total_ls * 1e3:>10.3f}"
          f"{sum(s for _, s in measured) * 1e3:>9.3f}")
    print(f"full generator jit: {t_full * 1e3:.3f} ms "
          f"({audio_s / t_full:.0f}x realtime, "
          f"MFU {100 * total_f / t_full / PEAK_FLOPS:.1f}%, "
          f"BW {total_b / t_full / 1e9:.0f} GB/s of {PEAK_BW / 1e9:.0f})")
    print(f"FOLDED generator jit: {t_folded * 1e3:.3f} ms "
          f"({audio_s / t_folded:.0f}x realtime, "
          f"MFU {100 * total_f / t_folded / PEAK_FLOPS:.1f}%, "
          f"{t_full / t_folded:.2f}x over true layout)")
    print(f"B=1 latency ({T_FRAMES} frames): true {t_b1 * 1e3:.1f} ms, "
          f"folded {t_b1_folded * 1e3:.1f} ms")
    print(f"light-speed bound: {total_ls * 1e3:.3f} ms "
          f"-> max achievable MFU {100 * total_f / total_ls / PEAK_FLOPS:.1f}% "
          f"at these dims")


if __name__ == "__main__":
    main()
