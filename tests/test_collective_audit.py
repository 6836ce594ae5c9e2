"""Audit the collectives GSPMD inserts for the dp2 x mp4 pretrain step.

VERDICT round-2 weak #7: tensor parallelism places weight shardings and lets
GSPMD propagate, but nothing recorded WHAT collectives XLA actually inserts.
This test compiles the real (tiny-dim) AVMAE pretrain step on a 2x4
{'data','model'} mesh and asserts the compiled HLO contains:

  * data-axis collectives (gradient sync between the two data rows), and
  * model-axis collectives (activation gathers/reduces within each 4-chip
    model group),

identified by their replica_groups. The mesh lays devices out row-major:
data row r owns devices [4r, 4r+1, 4r+2, 4r+3], so model-axis groups are
consecutive quadruples and data-axis partners differ by 4.
"""
import re

import numpy as np

import jax
import jax.numpy as jnp


def _expand_iota_groups(spec: str):
    """Expand HLO's IotaReplicaGroupList syntax to explicit groups.

    ``[G,S]<=[d0,d1,...]T(p0,p1,...)``: take iota(prod(d)) reshaped to
    (d0, d1, ...), transpose by the permutation, flatten, then split into
    G groups of S."""
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", spec)
    if not m:
        return None
    g, s = int(m.group(1)), int(m.group(2))
    dims = [int(x) for x in m.group(3).split(",")]
    arr = np.arange(int(np.prod(dims))).reshape(dims)
    if m.group(4):
        arr = arr.transpose([int(x) for x in m.group(4).split(",")])
    flat = arr.reshape(-1)
    return [list(map(int, flat[i * s:(i + 1) * s])) for i in range(g)]


def _collective_groups(hlo: str):
    """[(op, [[g0...], [g1...]]), ...] for every collective in the HLO.

    Handles both the explicit ``replica_groups={{0,1},{2,3}}`` and the
    iota ``replica_groups=[4,2]<=[2,4]T(1,0)`` syntaxes."""
    out = []
    pat = (r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
           r"[^\n]*replica_groups=("
           r"\{\{[^\n]*?\}\}"
           r"|\[\d+,\d+\]<=\[[\d,]+\](?:T\([\d,]+\))?)")
    for m in re.finditer(pat, hlo):
        op, spec = m.group(1), m.group(2)
        if spec.startswith("{"):
            groups = [[int(x) for x in g.split(",") if x.strip() != ""]
                      for g in re.findall(r"\{([\d,]*)\}", spec[1:-1])]
        else:
            groups = _expand_iota_groups(spec)
        if groups:
            out.append((op, groups))
    return out


def test_dp2_mp4_collectives_audit():
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

    cfg = pretrain.PretrainConfig(
        image_backbone="vit_small", audio_backbone="vit_small",
        image_depth=2, audio_depth=2, image_size=32, audio_mels=16,
        audio_frames=48, num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0,
        fusion_num_heads=6, image_decoder_depth=1, audio_decoder_depth=1,
        dtype=jnp.float32, steps_per_epoch=10.0)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    mesh = mesh_lib.make_mesh({"data": 2, "model": 4})
    params_tp = mesh_lib.tp_shard_params(params, mesh)
    _, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params_tp, cfg, world_batch=8, mesh=mesh)
    state = state.replace(params=params_tp)

    rng = np.random.RandomState(0)
    batch = mesh_lib.shard_batch({
        "image": rng.randn(8, 32, 32, 3).astype(np.float32),
        "audio": rng.randn(8, 16, 48, 1).astype(np.float32),
    }, mesh)

    raw = getattr(step_fn, "__wrapped__", step_fn)
    compiled = jax.jit(raw, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(0)).compile()
    hlo = compiled.as_text()
    colls = _collective_groups(hlo)
    assert colls, "no collectives found in the dp2 x mp4 HLO"

    # device d sits at (row=d//4, col=d%4); model row = data shard
    def axis(groups):
        rows = [{d // 4 for d in g} for g in groups]
        cols = [{d % 4 for d in g} for g in groups]
        if all(len(r) == 1 for r in rows):
            return "model"      # within one model row (incl. subgroups —
            # GSPMD emits pair/strided gathers inside the 4-wide groups)
        if all(len(c) == 1 for c in cols):
            return "data"       # across data rows at a fixed model col
        if groups == [list(range(8))]:
            return "global"
        return f"other:{groups}"

    from collections import Counter

    summary = Counter((op, axis(g)) for op, g in colls)
    print(f"dp2xmp4 collective audit: {dict(summary)}")

    # gradient sync across data rows must exist
    assert summary[("all-reduce", "data")] > 0, summary
    # activation/partial-sum communication within model rows must exist
    assert any(summary[(op, "model")] > 0
               for op in ("all-reduce", "all-gather", "reduce-scatter")), summary
    # nothing communicates across unrelated device sets
    bad = [k for k in summary if k[1].startswith("other")]
    assert not bad, ("unclassified collective groups", bad)
