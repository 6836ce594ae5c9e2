"""Train-step tests: schedules, param-group machinery, accum, 8-device DP mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepavfusion_tpu.train import lr_sched, trainer


# --------------------------------------------------------------------------- #
# Schedules vs reference math (util/lr_sched.py:4-24)
# --------------------------------------------------------------------------- #
def ref_lr(epoch, lr, wu, total):
    import math

    if epoch < wu:
        return lr * epoch / wu
    return lr * 0.5 * (1.0 + math.cos(math.pi * (epoch - wu) / (total - wu)))


def test_warmup_cosine_matches_reference():
    fn = lr_sched.warmup_cosine(1.5e-4, 50.0, 300.0, steps_per_epoch=10.0)
    for step in [0, 5, 100, 499, 500, 501, 1500, 2990, 2999]:
        epoch = step / 10.0
        np.testing.assert_allclose(
            float(fn(step)), ref_lr(epoch, 1.5e-4, 50.0, 300.0),
            rtol=1e-4, atol=1e-9,  # f32 cos near pi vs python f64
            err_msg=f"step {step}",
        )


def test_pretrained_mult_matches_reference():
    import math

    fn = lr_sched.pretrained_mult(0.0, 1.0, 150.0, steps_per_epoch=1.0)
    for e in [0, 10, 75, 149, 150, 200]:
        want = (
            (0.5 - 0.5 * math.cos(math.pi * e / 150.0)) * 1.0 if e < 150 else 1.0
        )
        np.testing.assert_allclose(float(fn(e)), want, rtol=1e-5, atol=1e-7)


def test_eval_epochs_expr():
    assert lr_sched.eval_epochs_expr("epochs/2", 300) == 150.0
    assert lr_sched.eval_epochs_expr(40, 300) == 40.0
    assert lr_sched.eval_epochs_expr(None, 300) == -1.0


# --------------------------------------------------------------------------- #
# Masks / multiplier trees
# --------------------------------------------------------------------------- #
def fake_params():
    return {
        "encoder": {
            "image": {
                "patch_embed": {"proj": {"kernel": jnp.zeros((16, 16, 3, 8)),
                                         "bias": jnp.zeros((8,))}},
                "blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24))}}},
                "blocks_1": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24))}}},
                "norm": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
            },
            "audio": {"blocks_0": {"mlp": {"fc1": {"kernel": jnp.zeros((8, 8))}}}},
            "fusion_tokens": jnp.zeros((1, 8, 8)),
            "fusion_blocks_1": {"mlp": {"fc1": {"kernel": jnp.zeros((8, 8))}}},
            "fusion_norm": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        },
        "image_decoder": {"pred": {"kernel": jnp.zeros((8, 768)), "bias": jnp.zeros((768,))}},
    }


def test_weight_decay_mask():
    import flax

    mask = flax.traverse_util.flatten_dict(lr_sched.weight_decay_mask(fake_params()))
    get = lambda *path: mask[path]
    assert get("encoder", "image", "patch_embed", "proj", "kernel")
    assert not get("encoder", "image", "patch_embed", "proj", "bias")
    assert not get("encoder", "image", "norm", "scale")       # 'norm' in path
    assert not get("encoder", "fusion_norm", "scale")
    assert get("image_decoder", "pred", "kernel")
    # fusion_tokens: ndim 3 and no bias/norm in name → reference DOES decay it
    assert get("encoder", "fusion_tokens")


def test_pretrained_mask():
    import flax

    mask = flax.traverse_util.flatten_dict(
        lr_sched.pretrained_mask(fake_params(), image_pt=True, audio_pt=False)
    )
    assert mask[("encoder", "image", "blocks_0", "attn", "qkv", "kernel")]
    assert not mask[("encoder", "audio", "blocks_0", "mlp", "fc1", "kernel")]
    assert not mask[("encoder", "fusion_tokens")]
    assert not mask[("image_decoder", "pred", "kernel")]


def test_layer_ids_and_decay_scales():
    assert lr_sched.layer_id_for_path("encoder/image/patch_embed/proj/kernel", 12) == 0
    assert lr_sched.layer_id_for_path("encoder/image/blocks_0/attn/qkv/kernel", 12) == 1
    assert lr_sched.layer_id_for_path("encoder/image/blocks_11/mlp/fc2/bias", 12) == 12
    assert lr_sched.layer_id_for_path("encoder/image/norm/scale", 12) == 13
    assert lr_sched.layer_id_for_path("encoder/fusion_tokens", 12) == 0
    assert lr_sched.layer_id_for_path("encoder/fusion_blocks_3/mlp/fc1/kernel", 12) == 4
    assert lr_sched.layer_id_for_path("image_head/kernel", 12) == 13

    import flax

    scales = flax.traverse_util.flatten_dict(
        lr_sched.layer_decay_scales(fake_params(), 0.75, depth=2)
    )
    np.testing.assert_allclose(
        scales[("encoder", "image", "patch_embed", "proj", "kernel")], 0.75**3
    )
    np.testing.assert_allclose(
        scales[("encoder", "image", "blocks_1", "attn", "qkv", "kernel")], 0.75**1
    )
    np.testing.assert_allclose(scales[("encoder", "image", "norm", "scale")], 1.0)


def test_layer_decay_scales_scanned_match_unrolled():
    """Scanned-trunk leaves get a per-layer multiplier vector equal to the
    unrolled per-block scalars; weight-decay mask discounts the scan axis."""
    import flax

    depth = 3
    unrolled = {
        "encoder": {
            "image": {f"blocks_{i}": {"attn": {"qkv": {
                "kernel": jnp.zeros((8, 24)), "bias": jnp.zeros((24,))}}}
                for i in range(depth)},
        },
    }
    scanned = {
        "encoder": {
            "layers": {"blk_image": {"attn": {"qkv": {
                "kernel": jnp.zeros((depth, 8, 24)),
                "bias": jnp.zeros((depth, 24))}}}},
        },
    }
    su = flax.traverse_util.flatten_dict(
        lr_sched.layer_decay_scales(unrolled, 0.75, depth=depth))
    ss = flax.traverse_util.flatten_dict(
        lr_sched.layer_decay_scales(scanned, 0.75, depth=depth))
    vec = ss[("encoder", "layers", "blk_image", "attn", "qkv", "kernel")]
    assert vec.shape == (depth, 1, 1)
    want = [su[("encoder", "image", f"blocks_{i}", "attn", "qkv", "kernel")]
            for i in range(depth)]
    np.testing.assert_allclose(np.ravel(vec), want)

    wd = flax.traverse_util.flatten_dict(lr_sched.weight_decay_mask(scanned))
    assert wd[("encoder", "layers", "blk_image", "attn", "qkv", "kernel")]
    # stacked bias is 2-D but must NOT be decayed (matches unrolled 1-D bias)
    assert not wd[("encoder", "layers", "blk_image", "attn", "qkv", "bias")]


# --------------------------------------------------------------------------- #
# Train step: convergence, accumulation equivalence, mesh
# --------------------------------------------------------------------------- #
def quad_loss(params, batch, key):
    pred = batch["x"] @ params["w"] + params["b"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {"loss": loss}


def make_quad(accum, mesh=None, lr=0.1):
    params = {"w": jnp.zeros((4, 1)), "b": jnp.zeros((1,))}
    import optax

    tx = optax.sgd(lr)
    state = trainer.TrainState.create(params, tx)
    step = trainer.make_train_step(quad_loss, tx, accum_iter=accum, mesh=mesh,
                                   donate=False)
    return state, step


def quad_batch(n, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 4).astype(np.float32)
    w = np.array([[1.0], [-2.0], [0.5], [3.0]], np.float32)
    y = x @ w + 0.25
    return {"x": jnp.asarray(x), "y": jnp.asarray(y)}


def test_train_step_converges():
    state, step = make_quad(accum=1)
    batch = quad_batch(64)
    for i in range(200):
        state, m = step(state, batch, jax.random.key(i))
    assert float(m["loss"]) < 1e-3
    assert int(state.step) == 200


def test_accum_equivalence():
    """accum=2 over a 2n batch == accum=1 with the mean of two half-batches'
    grads (same data, same order)."""
    batch = quad_batch(8, seed=1)
    s1, step1 = make_quad(accum=1)
    s2, step2 = make_quad(accum=2)
    s1b, _ = step1(s1, batch, jax.random.key(0))
    s2b, _ = step2(s2, batch, jax.random.key(0))
    # sgd on mean grads: identical params after one update
    np.testing.assert_allclose(
        np.asarray(s1b.params["w"]), np.asarray(s2b.params["w"]), atol=1e-6
    )


def test_train_step_on_8dev_mesh():
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh({"data": 8})
    state, step = make_quad(accum=1, mesh=mesh)
    state = mesh_lib.replicate(state, mesh)
    batch = mesh_lib.shard_batch(quad_batch(64, seed=2), mesh)
    for i in range(100):
        state, m = step(state, batch, jax.random.key(i))
    assert float(m["loss"]) < 1e-2
    # params stay replicated
    assert state.params["w"].sharding.is_fully_replicated


def test_mesh_result_matches_single_device():
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    batch = quad_batch(16, seed=3)
    s0, step0 = make_quad(accum=1)
    s0, _ = step0(s0, batch, jax.random.key(0))

    mesh = mesh_lib.make_mesh({"data": 8})
    s1, step1 = make_quad(accum=1, mesh=mesh)
    s1 = mesh_lib.replicate(s1, mesh)
    s1, _ = step1(s1, mesh_lib.shard_batch(batch, mesh), jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(s0.params["w"]), np.asarray(s1.params["w"]), atol=1e-6
    )


def test_tensor_parallel_matches_replicated():
    """tp_shard_params + inferred-sharding step == replicated DP step
    (GSPMD partitions the matmuls over the 'model' axis; results identical)."""
    import optax

    from deepavfusion_tpu.parallel import mesh as mesh_lib

    def mlp_loss(params, batch, key):
        h = jnp.maximum(batch["x"] @ params["w1"] + params["b1"], 0.0)
        pred = h @ params["w2"] + params["b2"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(16, 32) * 0.1, jnp.float32),
        "b1": jnp.zeros((32,)),
        "w2": jnp.asarray(rng.randn(32, 8) * 0.1, jnp.float32),
        "b2": jnp.zeros((8,)),
    }
    batch = {"x": jnp.asarray(rng.randn(16, 16), jnp.float32),
             "y": jnp.asarray(rng.randn(16, 8), jnp.float32)}
    tx = optax.adamw(1e-2)

    s0 = trainer.TrainState.create(params, tx)
    step0 = trainer.make_train_step(mlp_loss, tx, mesh=None, donate=False)
    s0, m0 = step0(s0, batch, jax.random.key(0))

    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh({"data": 2, "model": 4})
    params_tp = mesh_lib.tp_shard_params(params, mesh)
    # kernels sharded on their last dim; biases replicated
    assert params_tp["w1"].sharding.spec == P(None, "model")
    assert params_tp["b1"].sharding.is_fully_replicated
    s1 = trainer.TrainState.create(params_tp, tx)
    step1 = trainer.make_train_step(mlp_loss, tx, mesh=None, donate=False)
    batch_tp = mesh_lib.shard_batch(batch, mesh)
    s1, m1 = step1(s1, batch_tp, jax.random.key(0))

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s0.params["w1"]),
                               np.asarray(s1.params["w1"]), atol=1e-6)
    # updated params keep the tensor-parallel layout
    assert not s1.params["w1"].sharding.is_fully_replicated


def test_fsdp_matches_replicated():
    """tp_shard_params(model_axis='data') == FSDP/ZeRO-3: params + optimizer
    state shard over the data axis, results match the replicated step."""
    import optax

    from deepavfusion_tpu.parallel import mesh as mesh_lib

    def mlp_loss(params, batch, key):
        h = jnp.maximum(batch["x"] @ params["w1"] + params["b1"], 0.0)
        pred = h @ params["w2"] + params["b2"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(16, 32) * 0.1, jnp.float32),
        "b1": jnp.zeros((32,)),
        "w2": jnp.asarray(rng.randn(32, 8) * 0.1, jnp.float32),
        "b2": jnp.zeros((8,)),
    }
    batch = {"x": jnp.asarray(rng.randn(16, 16), jnp.float32),
             "y": jnp.asarray(rng.randn(16, 8), jnp.float32)}
    tx = optax.adamw(1e-2)

    s0 = trainer.TrainState.create(params, tx)
    step0 = trainer.make_train_step(mlp_loss, tx, mesh=None, donate=False)
    s0, m0 = step0(s0, batch, jax.random.key(0))

    mesh = mesh_lib.make_mesh({"data": 8})
    params_fsdp = mesh_lib.tp_shard_params(params, mesh, model_axis="data")
    assert not params_fsdp["w1"].sharding.is_fully_replicated
    s1 = trainer.TrainState.create(params_fsdp, tx)
    step1 = trainer.make_train_step(mlp_loss, tx, mesh=None, donate=False)
    s1, m1 = step1(s1, mesh_lib.shard_batch(batch, mesh), jax.random.key(0))

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s0.params["w1"]),
                               np.asarray(s1.params["w1"]), atol=1e-6)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_adamw_decoupled_weight_decay_matches_torch():
    """One AdamW step vs torch.optim.AdamW on identical params/grads."""
    import optax
    import torch

    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    g0 = np.array([[0.1, -0.2], [0.3, 0.4]], np.float32)

    params = {"w": jnp.asarray(w0)}
    opt_cfg = lr_sched.OptimizerConfig(
        lr=1e-2, warmup_epochs=0.0, epochs=10.0, steps_per_epoch=1.0,
        weight_decay=0.05,
    )
    tx, _ = lr_sched.make_adamw(params, opt_cfg)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g0)}, state, params)
    got = np.asarray(optax.apply_updates(params, updates)["w"])

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([tw], lr=1e-2, betas=(0.9, 0.95), weight_decay=0.05)
    tw.grad = torch.from_numpy(g0.copy())
    opt.step()
    np.testing.assert_allclose(got, tw.detach().numpy(), atol=2e-6)


def test_skip_nonfinite_grads():
    import optax

    def loss_bad(params, batch, key):
        loss = (params["w"] * batch["x"]).sum()
        return loss, {"loss": loss}

    params = {"w": jnp.ones((2,))}
    tx = optax.sgd(0.1)
    state = trainer.TrainState.create(params, tx)
    step = trainer.make_train_step(loss_bad, tx, accum_iter=1, donate=False,
                                   skip_nonfinite=True)
    # NaN input → NaN grads → update skipped, params unchanged
    state2, m = step(state, {"x": jnp.asarray([jnp.nan, 1.0])}, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(state2.params["w"]), [1.0, 1.0])
    assert not np.isfinite(float(m["grad_norm"]))
    # finite input → normal update
    state3, _ = step(state2, {"x": jnp.asarray([1.0, 1.0])}, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(state3.params["w"]), [0.9, 0.9])


def test_pos_embed_interpolate_2d():
    from deepavfusion_tpu.ops import pos_embed as pe

    table = pe.sincos_2d(16, (4, 4))
    out = pe.interpolate_2d(table, (4, 4), (8, 8))
    assert out.shape == (64, 16)
    # corner values approximately preserved
    np.testing.assert_allclose(out[0], table[0], atol=0.2)


def test_video_vit_converter_inflation():
    import torch

    from deepavfusion_tpu.convert import torch2jax as cvt
    from deepavfusion_tpu.models import video_vit as vv

    # build a 2D image-vit style state dict and convert for a video model
    sd = {}
    d, c = 48, 3
    sd["patch_embed.proj.weight"] = torch.randn(d, c, 16, 16)
    sd["patch_embed.proj.bias"] = torch.randn(d)
    for i in range(2):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(d)
        sd[f"{p}.norm1.bias"] = torch.zeros(d)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * d, d)
        sd[f"{p}.attn.qkv.bias"] = torch.zeros(3 * d)
        sd[f"{p}.attn.proj.weight"] = torch.randn(d, d)
        sd[f"{p}.attn.proj.bias"] = torch.zeros(d)
        sd[f"{p}.norm2.weight"] = torch.ones(d)
        sd[f"{p}.norm2.bias"] = torch.zeros(d)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * d, d)
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(d, 4 * d)
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(d)
    sd["norm.weight"] = torch.ones(d)
    sd["norm.bias"] = torch.zeros(d)

    tree = cvt.video_vit(sd, "", depth=2, tube=2)
    assert tree["patch_embed"]["proj"]["kernel"].shape == (2, 16, 16, 3, 48)
    # temporal slices identical (replication)
    k = tree["patch_embed"]["proj"]["kernel"]
    np.testing.assert_array_equal(k[0], k[1])

    cfg = vv.VideoViTConfig(input_size=(4, 32, 32), patch_size=(2, 16, 16),
                            embed_dim=48, depth=2, num_heads=4)
    model = vv.VideoViT(cfg)
    x = jnp.zeros((1, 4, 32, 32, 3))
    ref = model.init(jax.random.key(0), x)["params"]
    from deepavfusion_tpu.convert.torch2jax import assert_tree_matches

    assert_tree_matches(tree, jax.tree.map(np.shape, ref))
    out = model.apply({"params": tree}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_manager_roundtrip(tmp_path):
    import optax

    from deepavfusion_tpu.train.checkpoint import CheckpointManager

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    tx = optax.adam(1e-3)
    state = trainer.TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpts"), save_freq=2)

    mgr.save(1, state)
    assert mgr.exists("latest")
    mgr.save(2, state, is_best=True)          # periodic (freq 2) + best
    assert mgr.exists("best")
    assert (tmp_path / "ckpts" / "checkpoint_0002").exists()

    template = trainer.TrainState.create(
        {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}, tx)
    restored, epoch = mgr.resume(template)
    assert epoch == 2
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))

    # resume with nothing present returns the template
    mgr2 = CheckpointManager(str(tmp_path / "empty"), save_freq=2)
    same, epoch0 = mgr2.resume(template)
    assert epoch0 == 0


def test_batchnorm_global_stats_under_sharding():
    """BatchNorm inside a batch-sharded jit computes GLOBAL batch statistics
    (the SyncBatchNorm claim in models/classifier.py)."""
    import flax.linen as nn
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    class BN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False, use_bias=False,
                                use_scale=False, epsilon=1e-6)(x)

    rng = np.random.RandomState(0)
    x = rng.randn(16, 8).astype(np.float32) * 3 + 1.5
    m = BN()
    v = m.init(jax.random.key(0), jnp.asarray(x))

    # single device
    y0, st0 = m.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    # 8-device sharded batch
    mesh = mesh_lib.make_mesh({"data": 8})
    xs = mesh_lib.shard_batch({"x": x}, mesh)["x"]
    fn = jax.jit(lambda var, xx: m.apply(var, xx, mutable=["batch_stats"]))
    y1, st1 = fn(v, xs)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st0["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(st1["batch_stats"]["BatchNorm_0"]["mean"]), atol=1e-6)
