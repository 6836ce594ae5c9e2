"""Elastic topology-change resume: a checkpoint written under one mesh size
restores and continues under another.

Beyond-parity feature: the reference has NO elastic world-size support
(SURVEY.md §5.3 — a SLURM requeue must come back at the same GPU count or
the DDP state is wrong). Here the checkpoint stores only logical arrays;
``CheckpointManager.resume`` restores them against the NEW topology's
state template, and orbax lays them out for the template's shardings — so
a job saved on dp8 continues on dp4 (or dp2, or a TP mesh) with identical
training mathematics. Verified numerically below: save at dp8 after k
steps, resume at dp4, step once → parameters match the uninterrupted dp8
run to f32 reduction-order tolerance.
"""
import jax
import numpy as np
import pytest

from deepavfusion_tpu.parallel import mesh as mesh_lib
from deepavfusion_tpu.train.checkpoint import CheckpointManager

from tests.test_train_step import make_quad, quad_batch


def _run_steps(state, step, batch, mesh, n, start_key=0):
    sharded = mesh_lib.shard_batch(batch, mesh)
    for i in range(start_key, start_key + n):
        state, m = step(state, sharded, jax.random.key(i))
    return state, m


@pytest.mark.parametrize("resume_devices", [4, 2])
def test_resume_on_smaller_mesh(tmp_path, resume_devices):
    batch = quad_batch(64, seed=5)

    # ---- phase 1: train 3 steps on dp8, checkpoint
    mesh8 = mesh_lib.make_mesh({"data": 8})
    s8, step8 = make_quad(accum=1, mesh=mesh8)
    s8 = mesh_lib.replicate(s8, mesh8)
    s8, _ = _run_steps(s8, step8, batch, mesh8, n=3)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq=0)
    mgr.save(epoch=1, state=jax.device_get(s8))

    # ---- reference: continue 2 more steps uninterrupted on dp8
    ref, _ = _run_steps(s8, step8, batch, mesh8, n=2, start_key=3)

    # ---- phase 2: fresh process-equivalent at a SMALLER device count
    mesh_small = mesh_lib.make_mesh(
        {"data": resume_devices}, devices=jax.devices()[:resume_devices]
    )
    s_new, step_small = make_quad(accum=1, mesh=mesh_small)
    template = jax.device_get(s_new)  # host template, topology-free
    restored, epoch = mgr.resume(template)
    assert epoch == 1
    restored = mesh_lib.replicate(restored, mesh_small)
    assert int(restored.step) == 3

    got, _ = _run_steps(restored, step_small, batch, mesh_small, n=2,
                        start_key=3)
    np.testing.assert_allclose(
        np.asarray(got.params["w"]), np.asarray(ref.params["w"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.params["b"]), np.asarray(ref.params["b"]), atol=1e-6
    )
    assert int(got.step) == int(ref.step) == 5


def test_resume_onto_tensor_parallel_mesh(tmp_path):
    """dp8 checkpoint → dp2 x mp4 mesh with Megatron-style param placement:
    the restore is topology-free and tp_shard_params lays the restored tree
    out for the model axis."""
    batch = quad_batch(64, seed=6)
    mesh8 = mesh_lib.make_mesh({"data": 8})
    s8, step8 = make_quad(accum=1, mesh=mesh8)
    s8 = mesh_lib.replicate(s8, mesh8)
    s8, _ = _run_steps(s8, step8, batch, mesh8, n=3)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq=0)
    mgr.save(epoch=1, state=jax.device_get(s8))
    ref, _ = _run_steps(s8, step8, batch, mesh8, n=1, start_key=3)

    mesh_tp = mesh_lib.make_mesh({"data": 2, "model": 4})
    s_new, step_tp = make_quad(accum=1, mesh=mesh_tp)
    restored, _ = mgr.resume(jax.device_get(s_new))
    params = mesh_lib.tp_shard_params(restored.params, mesh_tp)
    restored = restored.replace(
        params=params,
        opt_state=mesh_lib.replicate(restored.opt_state, mesh_tp),
        step=mesh_lib.replicate(restored.step, mesh_tp),
    )
    got, _ = _run_steps(restored, step_tp, batch, mesh_tp, n=1, start_key=3)
    np.testing.assert_allclose(
        np.asarray(got.params["w"]), np.asarray(ref.params["w"]), atol=1e-6
    )
