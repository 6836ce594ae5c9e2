"""The single training-step engine shared by all task entry points.

TPU-native replacement for the reference Trainer (util/misc.py:27-163):

  reference                      here
  ------------------------------ -----------------------------------------
  DDP wrap + NCCL all-reduce     pjit over a 1-D 'data' mesh; XLA inserts
                                 the grad all-reduce over ICI
  AMP autocast + GradScaler      bf16 activations / f32 params+grads
                                 (no loss scaler needed on TPU)
  accum_iter loop + no_sync()    jax.lax.scan over microbatches inside ONE
                                 jitted step (grads averaged, a single
                                 optimizer update per step)
  grad-norm reporting            global-norm computed in-step
  n_steps tensor                 TrainState.step

One call = accum_iter microbatches = one optimizer update. The caller feeds
batches shaped (accum_iter * batch, ...) which the step reshapes to
(accum_iter, batch, ...) statically.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Any = struct.field(default_factory=dict)  # e.g. batch_stats

    @classmethod
    def create(cls, params, tx, model_state=None):
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   opt_state=tx.init(params), model_state=model_state or {})


# log10(|grad|) histogram bin edges for the wandb.watch analogue — 16 bins
# spanning denormal-adjacent to huge (values clip into the end bins).
GRAD_HIST_EDGES = tuple(float(x) for x in range(-12, 5))


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    accum_iter: int = 1,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    donate: bool = True,
    skip_nonfinite: bool = False,
    watch_gradients: bool = False,
):
    """Build the jitted train step.

    loss_fn(params, batch, key[, model_state]) → (loss, metrics_dict) or,
    when the model carries mutable collections (BatchNorm running stats),
    (loss, (metrics_dict, new_model_state)) with ``has_model_state`` inferred
    from the TrainState at call time. batch is a pytree whose leaves lead
    with the per-step batch dimension (= accum_iter × microbatch).
    """
    import inspect

    takes_state = "model_state" in inspect.signature(loss_fn).parameters

    def grads_one(params, batch, key, model_state):
        if takes_state:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key, model_state=model_state
            )
            metrics, new_ms = aux
        else:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            new_ms = model_state
        return grads, metrics, new_ms

    def step_fn(state: TrainState, batch, key):
        ms = state.model_state
        if accum_iter > 1:
            def micro(b):
                return jax.tree.map(
                    lambda x: x.reshape((accum_iter, x.shape[0] // accum_iter) + x.shape[1:]),
                    b,
                )

            mb = micro(batch)
            keys = jax.random.split(key, accum_iter)

            def body(carry, xs):
                gacc, ms_c = carry
                b, k = xs
                grads, metrics, ms_c = grads_one(state.params, b, k, ms_c)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                return (gacc, ms_c), metrics

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, ms), metrics = jax.lax.scan(body, (zero, ms), (mb, keys))
            grads = jax.tree.map(lambda g: g / accum_iter, gsum)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
        else:
            grads, metrics, ms = grads_one(state.params, batch, key, ms)

        gn = global_norm(grads)
        if skip_nonfinite:
            # reference Trainer's skip_grad option (util/misc.py:81-104):
            # a non-finite gradient skips the whole update, in-graph
            ok = jnp.isfinite(gn)
            grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, opt_state_new = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params)
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "shape") else new,
                opt_state_new, state.opt_state)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, model_state=ms)
        metrics = dict(metrics)
        metrics["grad_norm"] = gn
        if watch_gradients:
            # per-top-level-module gradient norms AND log-magnitude
            # histograms — the wandb.watch analogue (reference
            # util/misc.py:208-209), computed in-graph (one extra pass over
            # the gradients when the watch flag is on)
            for k, v in grads.items():
                metrics[f"grad_norm/{k}"] = global_norm(v)
                counts = None
                for leaf in jax.tree_util.tree_leaves(v):
                    lg = jnp.log10(
                        jnp.abs(leaf.astype(jnp.float32)).ravel() + 1e-30)
                    c, _ = jnp.histogram(lg, bins=jnp.asarray(GRAD_HIST_EDGES))
                    counts = c if counts is None else counts + c
                metrics[f"grad_hist/{k}"] = counts.astype(jnp.float32)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(data_axis))
        step = jax.jit(
            step_fn,
            in_shardings=(repl, batch_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    else:
        step = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return step


def make_eval_step(forward_fn: Callable, mesh: Optional[Mesh] = None,
                   data_axis: str = "data"):
    """Jitted, sharded inference step: forward_fn(params, batch) → outputs."""
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(data_axis))
        return jax.jit(forward_fn, in_shardings=(repl, batch_sh),
                       out_shardings=batch_sh)
    return jax.jit(forward_fn)
