"""Per-segment attribution of the B=64 ViT-B MAE pretrain step (VERDICT r3
item 2: decompose the decoder/masking/loss/AdamW tail with the knockout
methodology that located the fusion-track cost).

Measures, each as a K-iteration single-dispatch lax.scan chain (the only
artifact-immune timing through the axon tunnel — see bench.py):

  * full         — the complete optimizer step (bench.py's program)
  * fwd          — AVMAE forward + loss only
  * fwdbwd       — forward + gradients, no optimizer update
  * adamw        — tx.update + apply_updates on FIXED grads (pure optimizer:
                   reads/writes of p/m/v dominate — HBM-bound)
  * enc_fwd(+bwd)— DeepAVFusion trunk on visible tokens only
  * dec_img/aud  — one MAE decoder fwd(+bwd) at its full token count

Derived rows: bwd = fwdbwd - fwd; update_tail = full - fwdbwd (optimizer +
loss/metrics materialization); decoder totals; residual = fwdbwd -
(encoders + decoders + fusion estimate) = masking/patchify/loss/overlap.

Usage: python bench_step_attribution.py [batch] [iters]
Prints one JSON line; rows also stream to stderr as they land.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 64
    iters = int(argv[1]) if len(argv) > 1 else 100

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.ops import masking as mask_ops
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

    mesh = mesh_lib.make_mesh({"data": len(jax.devices())})
    cfg = pretrain.PretrainConfig(fusion_mlp_ratio=1.0, dtype=jnp.bfloat16,
                                  steps_per_epoch=1000.0)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    tx, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params, cfg, world_batch=batch, mesh=mesh)
    step_body = getattr(step_fn, "__wrapped__", step_fn)
    state = mesh_lib.replicate(state, mesh)

    rng = np.random.RandomState(0)
    batch_tree = mesh_lib.shard_batch({
        "image": rng.randn(batch, 224, 224, 3).astype(np.float32),
        "audio": rng.randn(batch, 128, 192, 1).astype(np.float32),
    }, mesh)

    rows = {}

    def chain(fn, carry, n=iters, label="", donate=False, retries=2):
        """One segment; tolerant of the remote compile service's known
        broken-pipe drops (retry) and records a null row on give-up so the
        remaining segments still run."""
        for attempt in range(retries + 1):
            try:
                return _chain(fn, carry, n, label, donate)
            except Exception as e:  # noqa: BLE001 — remote compile flake
                print(f"{label}: attempt {attempt} failed: "
                      f"{str(e)[:200]}", file=sys.stderr)
                time.sleep(30 * (attempt + 1))
        rows[label] = None
        return None

    def _chain(fn, carry, n, label, donate):
        def body(c, _):
            return fn(c), ()

        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0],
                    donate_argnums=(0,) if donate else ())
        out = f(carry)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        out = f(carry)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / n * 1e3
        rows[label] = round(ms, 3)
        print(f"{label}: {ms:.3f} ms", file=sys.stderr)
        return ms

    # NB: the full-step and adamw chains DONATE their carries (the train
    # state is ~4 GB f32 on a 16 GB chip — without donation the chain holds
    # two copies and OOMs), so they run LAST, after every segment that
    # still needs state.params.

    # ---- forward only / forward+grads ---------------------------------- #
    def loss_of(p, key):
        out = model.apply({"params": p}, batch_tree["image"],
                          batch_tree["audio"], key, deterministic=False,
                          rngs={"dropout": key})
        return out["loss"]

    def fwd(p):
        l = loss_of(p, jax.random.key(7))
        # fold the loss back so the chain stays live
        return jax.tree.map(lambda v: v * (1.0 + 0.0 * l.astype(v.dtype)), p)

    gradfn = jax.grad(loss_of)

    def fwdbwd(p):
        g = gradfn(p, jax.random.key(7))
        return jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype), p, g)

    chain(fwd, state.params, label="fwd")
    chain(fwdbwd, state.params, label="fwdbwd")

    # ---- decoders at full token count ------------------------------------ #
    from deepavfusion_tpu.models import avmae as avmae_mod

    enc = model.cfg.encoder
    li, la = enc.image.num_patches, enc.audio.num_patches

    for name, key_, n_vis, n_tot in (("dec_img", "image_decoder",
                                      li - int(li * 0.75), li),
                                     ("dec_aud", "audio_decoder",
                                      la - int(la * 0.8), la)):
        deccfg = getattr(model.cfg, key_)
        encside = enc.image if name == "dec_img" else enc.audio
        ps = encside.patch_size
        chans = 3 if name == "dec_img" else 1
        dec = avmae_mod.MAEDecoder(
            deccfg, encside.grid_size, ps[0] * ps[1] * chans,
            model.cfg.decoder_dim, model.cfg.decoder_num_heads,
            model.cfg.decoder_mlp_ratio, model.cfg.norm_eps,
            dtype=jnp.bfloat16)
        dparams = state.params[key_]
        x = jnp.asarray(rng.randn(batch, n_vis, enc.image.embed_dim),
                        jnp.bfloat16)
        xfus = jnp.asarray(rng.randn(batch, sum(enc.num_fusion_tkns),
                                     enc.image.embed_dim), jnp.bfloat16)
        ids_restore = mask_ops.random_masking(
            jax.random.key(4), batch, n_tot,
            1.0 - n_vis / n_tot).ids_restore

        def dec_loss(p, xx):
            pred = dec.apply({"params": p}, xx, xfus, ids_restore,
                             deterministic=False,
                             rngs={"dropout": jax.random.key(5)})
            return pred.astype(jnp.float32).mean()

        def dec_fwd(xx):
            s = dec_loss(dparams, xx)
            return xx * (1.0 + 0.0 * s.astype(xx.dtype))

        dgrad = jax.grad(dec_loss)

        def dec_fwdbwd(p):
            g = dgrad(p, x)
            return jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype),
                                p, g)

        chain(dec_fwd, x, label=f"{name}_fwd")
        chain(dec_fwdbwd, dparams, label=f"{name}_fwdbwd")

    # ---- encoder on visible tokens -------------------------------------- #
    ik = mask_ops.random_masking(jax.random.key(1), batch, li, 0.75).ids_keep
    ak = mask_ops.random_masking(jax.random.key(2), batch, la, 0.8).ids_keep
    from deepavfusion_tpu.models import deepavfusion as trunk_mod

    trunk = trunk_mod.DeepAVFusion(enc, dtype=jnp.bfloat16)
    tparams = {"params": state.params["encoder"]}

    def enc_fwd(x):
        xi, xa, xf = trunk.apply(tparams, x["image"], x["audio"],
                                 image_ids_keep=ik, audio_ids_keep=ak,
                                 deterministic=False,
                                 rngs={"dropout": jax.random.key(3)})
        s = (xi.astype(jnp.float32).mean() + xa.astype(jnp.float32).mean()
             + xf.astype(jnp.float32).mean())
        return jax.tree.map(lambda v: v * (1.0 + 0.0 * s.astype(v.dtype)), x)

    def enc_loss(p, x):
        xi, xa, xf = trunk.apply({"params": p}, x["image"], x["audio"],
                                 image_ids_keep=ik, audio_ids_keep=ak,
                                 deterministic=False,
                                 rngs={"dropout": jax.random.key(3)})
        return (xi.astype(jnp.float32).mean()
                + xa.astype(jnp.float32).mean()
                + xf.astype(jnp.float32).mean())

    egrad = jax.grad(enc_loss)

    def enc_fwdbwd(p):
        g = egrad(p, batch_tree)
        return jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype), p, g)

    chain(enc_fwd, batch_tree, label="enc_fwd", retries=0)
    chain(enc_fwdbwd, state.params["encoder"], label="enc_fwdbwd", retries=0)

    # ---- optimizer only (fixed grads) — donated carry -------------------- #
    import optax

    grads = jax.jit(gradfn)(state.params, jax.random.key(7))

    def adamw2(carry):
        prm, opt = carry
        upd, opt2 = tx.update(grads, opt, prm)
        return (optax.apply_updates(prm, upd), opt2)

    # donate COPIES so state.params stays alive for the full-step chain
    prm_copy = jax.jit(lambda p: jax.tree.map(lambda x: x * 1, p))(
        state.params)
    opt_state = tx.init(prm_copy)
    chain(adamw2, (prm_copy, opt_state), label="adamw", donate=True)
    del grads

    # ---- full optimizer step — donated carry, must run LAST ------------- #
    def full(st):
        st2, _ = step_body(st, batch_tree, jax.random.key(7))
        return st2

    chain(full, state, label="full_step", donate=True)

    def derive(name, fn):
        try:
            rows[name] = round(fn(), 3)
        except TypeError:   # a contributing segment failed to compile
            rows[name] = None

    derive("bwd_derived", lambda: rows["fwdbwd"] - rows["fwd"])
    derive("update_tail_derived", lambda: rows["full_step"] - rows["fwdbwd"])
    derive("decoders_fwdbwd", lambda: rows["dec_img_fwdbwd"]
           + rows["dec_aud_fwdbwd"])
    derive("residual_fwdbwd", lambda: rows["fwdbwd"] - rows["enc_fwdbwd"]
           - rows["decoders_fwdbwd"])

    print(json.dumps({
        "metric": "pretrain step attribution",
        "value": rows["full_step"],
        "unit": "ms/step (full)",
        "vs_baseline": 1.0,
        "batch": batch, "iters": iters,
        "backend": jax.default_backend(),
        "segments_ms": rows,
    }))


if __name__ == "__main__":
    main()
