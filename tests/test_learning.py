"""Optimization evidence: the training paths LEARN, not just "loss is finite".

VERDICT round-2 item 4a ("prove it learns"): every train path was verified
for finiteness/short decrease only. These tests demonstrate real
optimization through the production pieces (trainer.make_train_step, the
real models, the real LARS/masking machinery):

  * AVMAE memorizes a fixed batch — loss drops below 10% of initial
    (reference core loop train.py:140-187);
  * a frozen-encoder linear probe reaches 100% train accuracy on linearly
    separable synthetic AV data, while the frozen encoder stays bit-frozen
    (reference eval_linprobe.py protocol).

The on-hardware counterpart (loss curve + kNN probe above chance on the
avencode corpus) is recorded in NOTES.md.
"""
import numpy as np
import optax

import jax
import jax.numpy as jnp

from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.models import classifier as clf_mod
from deepavfusion_tpu.models import deepavfusion as trunk_mod
from deepavfusion_tpu.models.vit import vit_config
from deepavfusion_tpu.train import classify
from deepavfusion_tpu.train import lars as lars_lib
from deepavfusion_tpu.train import trainer as trainer_lib


def tiny_encoder_cfg():
    return trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", (32, 32), 3, depth=2, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", (16, 48), 1, depth=2, embed_dim=48, num_heads=4),
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0, fusion_num_heads=4,
    )


def test_avmae_overfits_fixed_batch():
    """MAE memorization: 400 AdamW steps on one fixed batch drive the masked
    reconstruction loss below 10% of its initial value (it reaches <1%)."""
    cfg = avmae_mod.AVMAEConfig(
        encoder=tiny_encoder_cfg(),
        image_decoder=avmae_mod.MAEDecoderConfig(depth=1, mask_ratio=0.5),
        audio_decoder=avmae_mod.MAEDecoderConfig(depth=1, mask_ratio=0.5),
        decoder_dim=32, decoder_num_heads=4,
    )
    model = avmae_mod.AVMAE(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(4, 32, 32, 3), jnp.float32),
        "audio": jnp.asarray(rng.randn(4, 16, 48, 1), jnp.float32),
    }
    params = model.init(jax.random.key(0), batch["image"], batch["audio"],
                        jax.random.key(1))["params"]
    tx = optax.adamw(2e-3)

    def loss_fn(p, b, key):
        out = model.apply({"params": p}, b["image"], b["audio"], key)
        return out["loss"], {"loss": out["loss"]}

    state = trainer_lib.TrainState.create(params, tx)
    step_fn = trainer_lib.make_train_step(loss_fn, tx, mesh=None, donate=True)

    state, m = step_fn(state, batch, jax.random.key(0))
    loss0 = float(jax.device_get(m["loss"]))
    for s in range(1, 400):
        state, m = step_fn(state, batch, jax.random.key(s))
    loss = float(jax.device_get(m["loss"]))
    assert np.isfinite(loss)
    assert loss < 0.1 * loss0, f"no memorization: {loss0:.3f} -> {loss:.3f}"


def test_linprobe_learns_separable_data():
    """Frozen-encoder linear probe (real LARS + head masking + BN feature
    norm) reaches 100% train top-1 on separable data; encoder stays frozen."""
    ncls, n = 4, 32
    model = clf_mod.AVClassifier(tiny_encoder_cfg(), ncls,
                                 freeze_encoder=True, input_norm=True)
    rng = np.random.RandomState(0)
    labels = np.arange(n) % ncls
    pat_i = rng.randn(ncls, 32, 32, 3) * 1.5
    pat_a = rng.randn(ncls, 16, 48, 1) * 1.5
    batch = {
        "image": jnp.asarray(rng.randn(n, 32, 32, 3) * 0.3 + pat_i[labels], jnp.float32),
        "audio": jnp.asarray(rng.randn(n, 16, 48, 1) * 0.3 + pat_a[labels], jnp.float32),
        "label": jnp.asarray(labels),
    }
    variables = model.init(jax.random.key(0), batch["image"][:1],
                           batch["audio"][:1], train=True)
    params, batch_stats = dict(variables["params"]), variables["batch_stats"]
    encoder_before = jax.tree.map(np.asarray, params["encoder"])

    head_mask = {k: jax.tree.map(lambda _: k.endswith("_head"), v)
                 for k, v in params.items()}
    tx = optax.masked(lars_lib.lars(lambda s: 0.3, weight_decay=0.0), head_mask)

    def loss_fn(p, b, key, model_state):
        (li, la, lf), updated = model.apply(
            {"params": p, **model_state}, b["image"], b["audio"],
            train=True, mutable=["batch_stats"])
        loss = classify.cross_entropy((li + la + lf) / 3.0, b["label"])
        return loss, ({"loss": loss}, updated)

    state = trainer_lib.TrainState.create(
        params, tx, model_state={"batch_stats": batch_stats})
    step_fn = trainer_lib.make_train_step(loss_fn, tx, mesh=None, donate=True)
    for s in range(150):
        state, m = step_fn(state, batch, jax.random.key(s))
    assert float(jax.device_get(m["loss"])) < 0.3

    li, la, lf = model.apply({"params": state.params, **state.model_state},
                             batch["image"], batch["audio"], train=False)
    acc = (np.asarray((li + la + lf) / 3).argmax(1) == labels).mean()
    assert acc == 1.0, f"train top-1 {acc}"

    # the stop-gradient freeze held: encoder params are bit-identical
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.params["encoder"], encoder_before)
