"""Multi-step training-trajectory parity vs the reference's torch loop.

test_train_step_parity.py proves ONE loss/grad/AdamW step matches the
reference; this test extends that to a 10-optimizer-step trajectory with
gradient accumulation (accum_iter=2) and the full schedule stack active —
linear warmup, cosine decay, AND the pretrained-group cosine ramp
(``pt_warmup_epochs`` given as the reference's string-expression form) — so
slow drift in schedule/accumulation/weight-decay interactions is caught,
not just single-step agreement.

Both sides consume IDENTICAL data and masks: the jax side runs the REAL
machinery (trainer.make_train_step's lax.scan accumulation +
lr_sched.make_adamw, exactly what train/pretrain.py assembles) with its
real key-derived masking; the torch side runs the reference's ACTUAL
optimizer/schedule/Trainer-step semantics (param_groups_pretrained +
adjust_learning_rate + grad/=accum at the boundary — util/misc.py:96-134,
train.py:151-171) with the jax-computed masks injected per microbatch.

Reference: util/misc.py:96-134 (accumulate/step), util/lr_sched.py:4-26
(schedule), train.py:151-171 (per-window lr adjust with epoch-fractional
micro-step index).
"""
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepavfusion_tpu.convert import torch2jax as cvt
from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.ops import masking as mask_ops
from deepavfusion_tpu.train import lr_sched, trainer

from reference_models import load_reference
from test_reference_parity import (AUD_SIZE, IMG_SIZE, jax_cfg, nchw,
                                   ref_avmae, ref_trunk)

ref = load_reference()

B = 2                      # microbatch
ACCUM = 2
N_UPDATES = 10
ARCH = "factorized_mmi"
LR, WD = 0.02, 0.05
EPOCHS = 5.0
WARMUP_EPOCHS = 1.0        # 2 updates of linear warmup
STEPS_PER_EPOCH = 2.0      # optimizer updates per epoch → 10 updates = 5 ep
PT_WARMUP_EXPR = "5.0/2"   # the reference's eval'd-string form
IMG_RATIO, AUD_RATIO = 0.75, 0.5


class _Opt(dict):
    __getattr__ = dict.__getitem__


def _convert(sd):
    return jax.tree.map(jnp.asarray, cvt.avmae(
        sd, image_depth=3, audio_depth=3, decoder_depth=2, fusion_arch=ARCH))


@pytest.fixture(scope="module")
def trajectories():
    # ---- shared model/params ------------------------------------------- #
    trunk = ref_trunk(ARCH, seed=33)
    mae = ref_avmae(trunk)
    mae.image_mask_ratio, mae.audio_mask_ratio = IMG_RATIO, AUD_RATIO
    mae.image_norm_loss = mae.audio_norm_loss = True
    sd = {f"encoder.{k}": v for k, v in trunk.state_dict().items()}
    sd.update({k: v for k, v in mae.state_dict().items()
               if not k.startswith("encoder.")})
    converted = _convert(sd)

    enc_cfg = jax_cfg(ARCH)
    model = avmae_mod.AVMAE(avmae_mod.AVMAEConfig(
        encoder=enc_cfg,
        image_decoder=avmae_mod.MAEDecoderConfig("plain", 2, IMG_RATIO, True),
        audio_decoder=avmae_mod.MAEDecoderConfig("plain", 2, AUD_RATIO, True),
        decoder_dim=32, decoder_num_heads=4,
    ))
    li = enc_cfg.image.num_patches
    la = enc_cfg.audio.num_patches

    # ---- pinned data + the jax side's key-derived masks ---------------- #
    rng = np.random.RandomState(7)
    imgs = rng.randn(N_UPDATES, ACCUM, B, *IMG_SIZE, 3).astype(np.float32)
    auds = rng.randn(N_UPDATES, ACCUM, B, *AUD_SIZE, 1).astype(np.float32)
    step_keys = [jax.random.fold_in(jax.random.key(42), s)
                 for s in range(N_UPDATES)]

    # Replicate the exact key plumbing of the real step:
    # make_train_step splits the step key into accum keys (trainer.py:98);
    # loss_fn splits each into (drop, mask) (train/pretrain.py:133-134);
    # AVMAE splits mask_key into (k_img, k_aud) (models/avmae.py:191).
    mask_seq = {li: [], la: []}
    for s in range(N_UPDATES):
        keys = jax.random.split(step_keys[s], ACCUM)
        for m in range(ACCUM):
            _, mask_key = jax.random.split(keys[m])
            k_img, k_aud = jax.random.split(mask_key)
            ii = mask_ops.random_masking(k_img, B, li, IMG_RATIO)
            ai = mask_ops.random_masking(k_aud, B, la, AUD_RATIO)
            mask_seq[li].append(tuple(np.asarray(x) for x in
                                      (ii.ids_keep, ii.mask, ii.ids_restore)))
            mask_seq[la].append(tuple(np.asarray(x) for x in
                                      (ai.ids_keep, ai.mask, ai.ids_restore)))

    # ---- torch trajectory (reference loop semantics) ------------------- #
    cursor = {li: 0, la: 0}

    def fake_masking(n, length, mask_ratio, device):
        ik, m, ir = mask_seq[length][cursor[length]]
        cursor[length] += 1
        return (torch.from_numpy(ik).long(), torch.from_numpy(m),
                torch.from_numpy(ir).long())

    mae.random_masking = fake_masking
    mae.train()
    nwd = [n for n, p in mae.named_parameters()
           if "bias" in n or "norm" in n]
    groups = ref.lr_sched.param_groups_pretrained(
        mae, WD, no_weight_decay_list=nwd, image_pt="mae_in1k",
        audio_pt=None)
    opt = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.95))
    args = types.SimpleNamespace(opt=_Opt(
        lr=LR, epochs=EPOCHS, warmup_epochs=WARMUP_EPOCHS,
        pt_warmup_epochs=PT_WARMUP_EXPR,
        pt_lr_mult_start=0.3, pt_lr_mult_end=1.0))

    len_loader = int(ACCUM * STEPS_PER_EPOCH)     # micro steps per epoch
    losses_t, lrs_t = [], []
    opt.zero_grad()
    for s in range(N_UPDATES):
        epoch = (s * ACCUM) // len_loader
        micro0 = (s * ACCUM) % len_loader
        # reference train.py:155 — lr set at each accum-window start with
        # the epoch-fractional MICRO-step index
        lr_now = ref.lr_sched.adjust_learning_rate(
            opt, epoch + micro0 / len_loader, args)
        lrs_t.append(lr_now)
        win_losses = []
        for m in range(ACCUM):
            loss_i, loss_a, _, _ = mae(nchw(imgs[s, m]), nchw(auds[s, m]))
            loss = loss_i + loss_a
            loss.backward()                        # grads accumulate
            win_losses.append(float(loss))
        # Trainer.step at the boundary (util/misc.py:109-134): grads /=
        # accum_iter, then optimizer.step(), then zero_grad
        with torch.no_grad():
            for g in opt.param_groups:
                for p in g["params"]:
                    if p.grad is not None:
                        p.grad /= ACCUM
        opt.step()
        opt.zero_grad()
        losses_t.append(float(np.mean(win_losses)))

    new_sd = {f"encoder.{k}": v for k, v in trunk.state_dict().items()}
    new_sd.update({k: v for k, v in mae.state_dict().items()
                   if not k.startswith("encoder.")})
    final_t = _convert(new_sd)

    # ---- jax trajectory (the REAL training machinery) ------------------ #
    opt_cfg = lr_sched.OptimizerConfig(
        lr=LR, warmup_epochs=WARMUP_EPOCHS, epochs=EPOCHS,
        steps_per_epoch=STEPS_PER_EPOCH, weight_decay=WD,
        pt_lr_mult_start=0.3, pt_lr_mult_end=1.0,
        pt_warmup_epochs=lr_sched.eval_epochs_expr(PT_WARMUP_EXPR, EPOCHS),
        image_pt=True, audio_pt=False)
    tx, lr_fn = lr_sched.make_adamw(converted, opt_cfg)

    def loss_fn(p, batch, key):                    # train/pretrain.py:133
        drop_key, mask_key = jax.random.split(key)
        out = model.apply({"params": p}, batch["image"], batch["audio"],
                          mask_key, deterministic=False,
                          rngs={"dropout": drop_key})
        return out["loss"], {"loss": out["loss"]}

    step = trainer.make_train_step(loss_fn, tx, accum_iter=ACCUM,
                                   donate=False)
    state = trainer.TrainState.create(converted, tx)
    losses_j, lrs_j = [], []
    for s in range(N_UPDATES):
        batch = {
            "image": jnp.asarray(imgs[s].reshape(ACCUM * B, *IMG_SIZE, 3)),
            "audio": jnp.asarray(auds[s].reshape(ACCUM * B, *AUD_SIZE, 1)),
        }
        lrs_j.append(float(lr_fn(s)))
        state, metrics = step(state, batch, step_keys[s])
        losses_j.append(float(metrics["loss"]))

    return types.SimpleNamespace(
        losses_t=losses_t, losses_j=losses_j, lrs_t=lrs_t, lrs_j=lrs_j,
        final_t=final_t, final_j=state.params)


def test_schedule_parity(trajectories):
    """Per-update lr (warmup + cosine) matches the reference's
    adjust_learning_rate at every accumulation boundary."""
    # jax computes the schedule in f32 (vs torch's f64): rtol ~1e-5
    np.testing.assert_allclose(trajectories.lrs_j, trajectories.lrs_t,
                               rtol=1e-5)


def test_loss_trajectory_parity(trajectories):
    """Per-update mean loss tracks the reference loop within 1e-3 rel."""
    lt = np.asarray(trajectories.losses_t)
    lj = np.asarray(trajectories.losses_j)
    np.testing.assert_allclose(lj, lt, rtol=1e-3, err_msg=str((lt, lj)))
    # and training actually progressed
    assert lt[-1] < lt[0]


def _mask_keyside_bias(path: str, a: np.ndarray) -> np.ndarray:
    """Zero the key-side slice of attention biases: softmax is invariant to
    a key bias (q·bk is constant over keys), so its true gradient is 0 and
    Adam random-walks it on float noise — ±lr per step on BOTH frameworks,
    in uncorrelated directions (same exclusion as
    test_train_step_parity.py's attn.k.bias carve-out)."""
    a = np.asarray(a).copy()
    if path.endswith("['qkv']['bias']"):
        d = a.shape[-1] // 3
        a[d:2 * d] = 0.0
    elif path.endswith("['kv']['bias']"):
        a[: a.shape[-1] // 2] = 0.0
    elif path.endswith("['k']['bias']"):
        a[:] = 0.0
    return a


def test_final_param_parity(trajectories):
    """Parameters after 10 accumulated AdamW updates still agree
    (key-side attention biases excluded — zero-gradient directions)."""
    flat_t = jax.tree_util.tree_leaves_with_path(trajectories.final_t)
    flat_j = jax.tree_util.tree_leaves_with_path(trajectories.final_j)
    assert [p for p, _ in flat_t] == [p for p, _ in flat_j]
    for (path, pt), (_, pj) in zip(flat_t, flat_j):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            _mask_keyside_bias(key, pj), _mask_keyside_bias(key, pt),
            atol=5e-4, rtol=5e-3, err_msg=key)
