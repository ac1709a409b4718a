"""Training framework tests: optimizer/schedules, losses, trainer convergence,
checkpoint round trip, GAN alternation, and SPMD data parallel on the virtual
8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.training import (
    ExperimentSaver,
    GANTrainer,
    OptimizerConfig,
    Trainer,
    TrainerConfig,
    build_lr_schedule,
)
from speechflow_tpu.training.losses import (
    GateLoss,
    GuidedAttentionLoss,
    LossSchedule,
    MLELoss,
    RegressionLoss,
    SoftDTWLoss,
    SpectralLoss,
    VAELoss,
)
from speechflow_tpu.training.optimizer import ParamGroup


class TinyModel(nnx.Module):
    def __init__(self, din=8, dout=4, rngs=None):
        rngs = rngs or nnx.Rngs(0)
        self.l1 = nnx.Linear(din, 32, rngs=rngs)
        self.l2 = nnx.Linear(32, dout, rngs=rngs)

    def __call__(self, inputs):
        return self.l2(nnx.relu(self.l1(inputs["x"])))


def _criterion(outputs, targets, step):
    return {"mse": jnp.mean((outputs - targets["y"]) ** 2)}


def _batch_proc(batch):
    return {"x": batch["x"]}, {"y": batch["y"]}


class SyntheticLoader:
    def __init__(self, n=8, din=8, dout=4, seed=0):
        rng = np.random.default_rng(seed)
        self.w = rng.normal(size=(din, dout)).astype(np.float32)
        self.din, self.dout = din, dout
        self.rng = rng
        self.n = n

    def next_batch(self):
        x = self.rng.normal(size=(self.n, self.din)).astype(np.float32)
        return {"x": x, "y": x @ self.w}


# ------------------------------------------------------------------ schedules / losses


def test_lr_schedules():
    s = build_lr_schedule("WarmupInvRsqrtLR", lr=1e-3, warmup_steps=100)
    assert float(s(1)) < 1e-3
    assert abs(float(s(100)) - 1e-3) < 1e-9
    assert float(s(400)) == pytest.approx(1e-3 * 0.5, rel=1e-3)
    c = build_lr_schedule("WarmupCosine", lr=1e-3, warmup_steps=10, decay_steps=100)
    assert float(c(10)) == pytest.approx(1e-3, rel=1e-5)


def test_loss_schedule_gating():
    sched = LossSchedule(scale=2.0, begin_iter=10, end_iter=20)
    assert float(sched.gate(jnp.asarray(5))) == 0.0
    assert float(sched.gate(jnp.asarray(15))) == 2.0
    assert float(sched.gate(jnp.asarray(25))) == 0.0
    ann = LossSchedule(scale=1.0, begin_iter=0, anneal_iters=100)
    assert float(ann.gate(jnp.asarray(50))) == pytest.approx(0.5)


def test_losses_basic(rng):
    b, t, d = 2, 16, 8
    out = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    lens = jnp.asarray([16, 8])
    l1 = SpectralLoss(kind="l1")(out, tgt, lengths=lens)
    assert np.isfinite(float(l1)) and float(l1) > 0
    # masking: corrupting padded frames must not change the loss
    tgt2 = tgt.at[1, 8:].set(99.0)
    assert float(SpectralLoss(kind="l1")(out, tgt2, lengths=lens)) == pytest.approx(float(l1), rel=1e-6)
    # stacked predictions
    stacked = jnp.stack([out, out + 0.1])
    assert np.isfinite(float(SpectralLoss(kind="l2")(stacked, tgt, lengths=lens)))

    gate_logits = jnp.asarray(rng.normal(size=(b, t)).astype(np.float32))
    gate_tgt = (jnp.arange(t)[None] >= 14).astype(jnp.float32).repeat(b, 0)
    assert float(GateLoss()(gate_logits, gate_tgt, lengths=lens)) > 0

    mu, logvar = out[..., :2], out[..., 2:4]
    assert float(VAELoss()((mu, logvar))) > 0

    z = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    logdet = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
    assert np.isfinite(float(MLELoss()((z, logdet), lengths=lens)))

    attn = jax.nn.softmax(jnp.asarray(rng.normal(size=(b, t, 6)).astype(np.float32)), -1)
    ga = GuidedAttentionLoss()(attn, in_lengths=jnp.asarray([6, 4]), out_lengths=lens)
    assert np.isfinite(float(ga))


@pytest.mark.slow
def test_soft_dtw_loss(rng):
    a = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    # identical sequences: near-zero soft-DTW; diverging: larger
    same = float(SoftDTWLoss(gamma=0.1)(a, a))
    diff = float(SoftDTWLoss(gamma=0.1)(a, a + 1.0))
    assert diff > same
    # differentiable
    g = jax.grad(lambda x: SoftDTWLoss(gamma=0.1)(x, a))(a + 0.5)
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------------------------------------ trainer


def test_trainer_converges(tmp_path):
    model = TinyModel()
    loader = SyntheticLoader()
    tr = Trainer(model, _criterion, _batch_proc,
                 OptimizerConfig(method="adamw", lr=3e-3),
                 TrainerConfig(max_steps=300, log_every=1000, ckpt_every=10**9))
    first = tr.training_step(loader.next_batch())
    for _ in range(299):
        last = tr.training_step(loader.next_batch())
    assert last["mse"] < first["mse"] * 0.1, (first, last)


def test_trainer_checkpoint_roundtrip(tmp_path):
    model = TinyModel()
    loader = SyntheticLoader()
    saver = ExperimentSaver(tmp_path)
    tr = Trainer(model, _criterion, _batch_proc,
                 OptimizerConfig(lr=1e-3),
                 TrainerConfig(max_steps=20, log_every=1000, ckpt_every=10**9),
                 saver=saver)
    for _ in range(20):
        tr.training_step(loader.next_batch())
    path = tr.save_checkpoint(extra={"alphabet": {"symbols": ["a", "b"]}})
    ref = tr.validation_step(loader.next_batch())

    model2 = TinyModel(rngs=nnx.Rngs(42))
    tr2 = Trainer(model2, _criterion, _batch_proc, OptimizerConfig(lr=1e-3),
                  TrainerConfig(max_steps=20))
    payload = tr2.load_checkpoint(path)
    assert tr2.global_step == 20
    assert payload["alphabet"]["symbols"] == ["a", "b"]
    assert "jax" in payload["versions"]
    # same weights -> same loss on a fixed batch
    batch = loader.next_batch()
    m1 = tr.validation_step(batch)
    m2 = tr2.validation_step(batch)
    assert m1["mse"] == pytest.approx(m2["mse"], rel=1e-5)
    # get_last_checkpoint finds it
    assert ExperimentSaver.get_last_checkpoint(saver.expr_path) == path


def test_param_group_window():
    model = TinyModel()
    loader = SyntheticLoader()
    # freeze l2 until iteration 1000 -> its weights must not move
    cfg = OptimizerConfig(lr=1e-2, param_groups=[
        ParamGroup(pattern="l2", lr_scale=1.0, begin_iter=1000)])
    tr = Trainer(model, _criterion, _batch_proc, cfg, TrainerConfig(max_steps=10))
    w_before = np.asarray(model.l2.kernel[...]).copy()
    w1_before = np.asarray(model.l1.kernel[...]).copy()
    for _ in range(10):
        tr.training_step(loader.next_batch())
    assert np.allclose(np.asarray(model.l2.kernel[...]), w_before)
    assert not np.allclose(np.asarray(model.l1.kernel[...]), w1_before)


def test_nan_guard():
    model = TinyModel()
    tr = Trainer(model, _criterion, _batch_proc, OptimizerConfig(lr=1e-3),
                 TrainerConfig(max_steps=5))
    w_before = np.asarray(model.l1.kernel[...]).copy()
    bad = {"x": np.full((4, 8), np.nan, np.float32), "y": np.zeros((4, 4), np.float32)}
    tr.training_step(bad)
    # non-finite grads rejected: weights unchanged
    assert np.allclose(np.asarray(model.l1.kernel[...]), w_before)
    good = SyntheticLoader().next_batch()
    tr.training_step(good)
    assert not np.allclose(np.asarray(model.l1.kernel[...]), w_before)


# ------------------------------------------------------------------ GAN trainer


class TinyGen(nnx.Module):
    def __init__(self, rngs=None):
        self.l = nnx.Linear(8, 8, rngs=rngs or nnx.Rngs(0))

    def __call__(self, inputs):
        return self.l(inputs["x"])


class TinyDisc(nnx.Module):
    def __init__(self, rngs=None):
        self.l = nnx.Linear(8, 1, rngs=rngs or nnx.Rngs(1))

    def __call__(self, x):
        return self.l(x)


def test_gan_trainer_alternates():
    def gen_crit(gen_out, disc, inputs, targets, step):
        adv = jnp.mean((disc(gen_out) - 1.0) ** 2)
        rec = jnp.mean((gen_out - targets["y"]) ** 2)
        return {"adv": adv, "rec": rec}

    def disc_crit(gen_out, disc, inputs, targets, step):
        real = jnp.mean((disc(targets["y"]) - 1.0) ** 2)
        fake = jnp.mean(disc(gen_out) ** 2)
        return {"real": real, "fake": fake}

    def bp(batch):
        return {"x": batch["x"]}, {"y": batch["y"]}

    rng = np.random.default_rng(0)
    gan = GANTrainer(TinyGen(), TinyDisc(), gen_crit, disc_crit, bp,
                     config=TrainerConfig(max_steps=10), disc_every=2)
    for i in range(4):
        x = rng.normal(size=(4, 8)).astype(np.float32)
        m = gan.training_step({"x": x, "y": x * 0.5})
        assert "gen/total" in m
        assert ("disc/total" in m) == (i % 2 == 0)
    assert gan.global_step == 4


# ------------------------------------------------------------------ SPMD


def test_spmd_data_parallel_step():
    """Train step with batch sharded over the 8-device CPU mesh."""
    from speechflow_tpu.parallel import make_mesh, shard_batch

    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    model = TinyModel()
    tr = Trainer(model, _criterion, _batch_proc, OptimizerConfig(lr=1e-3),
                 TrainerConfig(max_steps=5, use_mesh=True))
    loader = SyntheticLoader(n=16)
    first = tr.training_step(loader.next_batch())
    for _ in range(30):
        last = tr.training_step(loader.next_batch())
    assert last["mse"] < first["mse"]


def test_gan_spmd_data_parallel():
    """GAN step with batches sharded over the virtual 8-device mesh."""
    import jax

    from tests.test_training import TinyDisc, TinyGen  # self-import for clarity

    def gen_crit(gen_out, disc, inputs, targets, step):
        return {"rec": jnp.mean((gen_out - targets["y"]) ** 2)}

    def disc_crit(gen_out, disc, inputs, targets, step):
        return {"d": jnp.mean(disc(gen_out) ** 2)}

    assert jax.device_count() >= 8
    gan = GANTrainer(TinyGen(), TinyDisc(), gen_crit, disc_crit,
                     lambda b: ({"x": b["x"]}, {"y": b["y"]}),
                     config=TrainerConfig(max_steps=5, use_mesh=True))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    first = gan.training_step({"x": x, "y": x * 0.5})
    for _ in range(10):
        last = gan.training_step({"x": x, "y": x * 0.5})
    assert last["gen/rec"] < first["gen/rec"]


# ------------------------------------------------------------------ mixed precision / grad accum


def test_bf16_trainer_converges():
    """Mixed-precision step: fp32 master weights, bf16 compute; loss must
    still converge and weights must remain fp32."""
    model = TinyModel()
    tr = Trainer(model, _criterion, _batch_proc, OptimizerConfig(lr=3e-3),
                 TrainerConfig(max_steps=100, mixed_precision=True))
    loader = SyntheticLoader()
    first = tr.training_step(loader.next_batch())
    for _ in range(60):
        last = tr.training_step(loader.next_batch())
    assert last["mse"] < first["mse"] * 0.5
    assert model.l1.kernel[...].dtype == jnp.float32


def test_grad_accum_steps_every_k():
    """With grad_accum=4, params change only on every 4th micro-batch and the
    accumulated update approximates one big-batch step."""
    loader = SyntheticLoader(n=4)
    batches = [loader.next_batch() for _ in range(4)]

    model = TinyModel(rngs=nnx.Rngs(7))
    tr = Trainer(model, _criterion, _batch_proc,
                 OptimizerConfig(lr=1e-2, grad_accum=4, grad_clip=None),
                 TrainerConfig(max_steps=100))
    w0 = np.asarray(model.l1.kernel[...]).copy()
    for i, b in enumerate(batches):
        tr.training_step(b)
        changed = not np.allclose(np.asarray(model.l1.kernel[...]), w0)
        assert changed == (i == 3), f"params changed at micro-step {i}"
    w_accum = np.asarray(model.l1.kernel[...]).copy()

    # one step on the concatenated big batch with the same init
    model2 = TinyModel(rngs=nnx.Rngs(7))
    tr2 = Trainer(model2, _criterion, _batch_proc,
                  OptimizerConfig(lr=1e-2, grad_clip=None),
                  TrainerConfig(max_steps=100))
    big = {k: np.concatenate([b[k] for b in batches]) for k in batches[0]}
    tr2.training_step(big)
    w_big = np.asarray(model2.l1.kernel[...])
    assert np.abs(w_accum - w_big).max() < 5e-4


def test_bf16_gan_step():
    def gen_crit(gen_out, disc, inputs, targets, step):
        return {"adv": jnp.mean((disc(gen_out) - 1.0) ** 2),
                "rec": jnp.mean((gen_out - targets["y"]) ** 2)}

    def disc_crit(gen_out, disc, inputs, targets, step):
        return {"real": jnp.mean((disc(targets["y"]) - 1.0) ** 2),
                "fake": jnp.mean(disc(gen_out) ** 2)}

    gan = GANTrainer(TinyGen(), TinyDisc(), gen_crit, disc_crit,
                     lambda b: ({"x": b["x"]}, {"y": b["y"]}),
                     gen_optimizer=OptimizerConfig(lr=5e-3),
                     disc_optimizer=OptimizerConfig(lr=5e-3),
                     config=TrainerConfig(max_steps=10, mixed_precision=True))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 8)).astype(np.float32)
    batch = {"x": x, "y": x * 0.5}
    first = last = None
    for _ in range(60):
        m = gan.training_step(batch)
        first = first or m
        last = m
    assert last["gen/rec"] < first["gen/rec"]
    assert gan.generator.l.kernel[...].dtype == jnp.float32


def test_saver_legacy_key_remap():
    """Checkpoints saved before the round-3 refactors (NeuralCodec inline
    decoder -> nested CodecDecoder; SnakeUpsampleHead resblocks -> MRF
    nesting) must load via the migration shim in ExperimentSaver."""
    import numpy as np

    from speechflow_tpu.training.saver import ExperimentSaver

    legacy = {
        "codec": {
            "enc": {"w": np.ones(2)},
            "dec_pre": {"kernel": np.ones(3)},
            "dec": {"0": {"kernel": np.ones(3)}},
            "dec_post": {"kernel": np.ones(3)},
        },
        "head": {
            "resblocks": {
                "0": {"convs": {"0": {"kernel": np.ones(2)}}, "acts": {}},
                "1": {"convs": {"0": {"kernel": np.ones(2)}}, "acts": {}},
            },
        },
    }
    fixed = ExperimentSaver._remap_legacy_keys(legacy)
    assert "decoder" in fixed["codec"] and "dec_pre" not in fixed["codec"]
    assert set(fixed["codec"]["decoder"]) == {"dec_pre", "dec", "dec_post"}
    rb = fixed["head"]["resblocks"]
    assert set(rb["0"]) == {"0"} and "convs" in rb["0"]["0"]

    # current-format trees pass through untouched
    current = {
        "codec": {"decoder": {"dec_pre": {"kernel": np.ones(3)}}},
        "head": {"resblocks": {"0": {"0": {"convs": {}, "acts": {}}}}},
    }
    out = ExperimentSaver._remap_legacy_keys(
        {k: dict(v) for k, v in current.items()})
    assert out["head"]["resblocks"]["0"] == current["head"]["resblocks"]["0"]
    assert "decoder" in out["codec"]
