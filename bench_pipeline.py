"""End-to-end input-pipeline proof: decode → log-mel → H2D → train step as
ONE sustained pipeline (VERDICT r3 item 4).

Runs the full production path — avencode H.264/AAC corpus → C++ decode
(fused crop) → numpy log-mel → threaded prefetching loader → sharded H2D →
jitted bf16 ViT-B AVMAE optimizer step — for N steps with NO per-step device
sync (losses are fetched once at the end, so the dispatch queue pipelines
host and device work), and compares against a device-bound control: the
IDENTICAL loop over pre-decoded host batches (same H2D, no decode). The gap
is the host pipeline's shortfall; `required_cores_per_chip` projects the
worker count needed to feed one chip at the device rate (this VM has 1 core,
so multi-worker scaling is a projection from sustained clips/s/core — the
honest statement NOTES.md r3 demanded).

Usage: python bench_pipeline.py [steps=40] [batch=64] [--entropy=0|1]
Prints ONE JSON line.
"""
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

NATIVE = Path(__file__).parent / "deepavfusion_tpu" / "native"


def make_corpus(entropy: int, n_clips: int):
    corpus = Path(os.path.expanduser(
        f"~/.cache/deepavfusion_tpu/pipe_corpus_e{entropy}"))
    enc = NATIVE / "avencode"
    if not enc.exists():
        subprocess.run(["make", "-C", str(NATIVE), "avencode"], check=True,
                       capture_output=True)
    corpus.mkdir(parents=True, exist_ok=True)
    fns = sorted(corpus.glob("clip*.mp4"))
    if len(fns) >= n_clips:
        return corpus, [f.name for f in fns][:n_clips]

    def gen(i):
        fn = corpus / f"clip{i:04d}.mp4"
        if not fn.exists():
            args = [str(enc), str(fn), "6", "25", "320", "240", str(i)]
            if entropy:
                args.append("1")
            subprocess.run(args, check=True, capture_output=True)
        return fn.name

    with ThreadPoolExecutor(os.cpu_count() or 8) as pool:
        return corpus, sorted(pool.map(gen, range(n_clips)))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(argv[0]) if argv else 40
    batch = int(argv[1]) if len(argv) > 1 else 64
    entropy = 0
    for a in sys.argv[1:]:
        if a.startswith("--entropy="):
            entropy = int(a.split("=")[1])

    corpus, files = make_corpus(entropy, 200)

    import jax
    import jax.numpy as jnp

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.data import datasets, loader, transforms
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

    mesh = mesh_lib.make_mesh({"data": len(jax.devices())})
    # scan + remat: the plain scan trunk's f32 stacked activations OOM a
    # 16 GB v5e at B=64 (16.18G > 15.75G, measured r4); remat fits and is
    # the config production tunnels use anyway. The device rate here is a
    # CONTROL for the host pipeline, not the bench.py throughput record.
    cfg = pretrain.PretrainConfig(fusion_mlp_ratio=1.0, dtype=jnp.bfloat16,
                                  scan_layers=True, remat=True,
                                  steps_per_epoch=100.0)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    _, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params, cfg, world_batch=batch, mesh=mesh)
    state = mesh_lib.replicate(state, mesh)

    audio_dur = cfg.audio_frames / 64.0
    # uint8-H2D lever (production default, data/pipeline.py): frames cross
    # the host->device link as uint8 (9.6 MB/batch vs 38.5 f32) and are
    # normalized in-graph. DAVF_BENCH_U8=0 restores host-f32 shipping.
    u8 = os.environ.get("DAVF_BENCH_U8", "1") == "1"
    db = datasets.VideoDataset(
        base_path=str(corpus), video_files=list(files),
        class_labels=[0] * len(files), class_desc=["c0"],
        visual_transform=transforms.ImageTrainTransform(cfg.image_size, 0.5,
                                                        normalize=not u8),
        audio_transform=transforms.AudioTrainTransform(
            16000, audio_dur, cfg.audio_mels),
        audio_dur=audio_dur, temporal_jitter=True,
    )
    workers = int(os.environ.get("DAVF_BENCH_WORKERS",
                                 str(max(os.cpu_count() or 1, 1))))
    dl = loader.DataLoader(db, batch_size=batch, shuffle=True,
                           drop_last=True, workers=workers, prefetch=2,
                           replacement=True)

    def run_loop(next_batch, n, label):
        """n steps, no per-step sync; returns (wall_s, data_wait_s)."""
        nonlocal state
        waited = 0.0
        # warmup: 2 steps compiled + executed, then fence
        for s in range(2):
            gb = mesh_lib.shard_batch(next_batch(), mesh)
            state, m = step_fn(state, gb, jax.random.key(s))
        _ = float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for s in range(n):
            tw = time.perf_counter()
            b = next_batch()
            waited += time.perf_counter() - tw
            gb = mesh_lib.shard_batch(b, mesh)
            state, m = step_fn(state, gb, jax.random.key(100 + s))
        last = float(jax.device_get(m["loss"]))
        wall = time.perf_counter() - t0
        assert np.isfinite(last), last
        print(f"{label}: {wall:.2f}s for {n} steps "
              f"(data wait {waited:.2f}s), loss {last:.3f}", file=sys.stderr)
        return wall, waited

    # device-bound control: same loop over pre-decoded host batches
    # (cycle the loader: one epoch is only len(files)//batch batches)
    it = iter(dl)
    pre = []
    while len(pre) < 4:
        try:
            pre.append(next(it))
        except StopIteration:
            it = iter(dl)
    pre = [{k: b[k] for k in ("image", "audio")} for b in pre]
    ctrl_wall, _ = run_loop(lambda: pre[np.random.randint(len(pre))], steps,
                            "device-bound control")

    it = iter(dl)

    def real_batch():
        nonlocal it
        try:
            b = next(it)
        except StopIteration:
            it = iter(dl)
            b = next(it)
        return {k: b[k] for k in ("image", "audio")}

    e2e_wall, e2e_wait = run_loop(real_batch, steps, "end-to-end")

    e2e_cps = steps * batch / e2e_wall
    ctrl_cps = steps * batch / ctrl_wall
    # sustained host rate per core: when the loop is host-bound the e2e rate
    # IS the aggregate host rate; per-core = that / workers (1 on this VM)
    host_rate = steps * batch / max(e2e_wall, 1e-9)
    req_cores = ctrl_cps / (host_rate / max(workers, 1))
    print(json.dumps({
        "metric": "sustained decode->mel->H2D->train pipeline",
        "value": round(e2e_cps, 1),
        "unit": "clips/s end-to-end",
        "vs_baseline": round(e2e_cps / max(ctrl_cps, 1e-9), 3),
        "entropy": entropy, "steps": steps, "batch": batch,
        "u8_images": u8,
        "h2d_mb_per_batch": round(sum(
            v.nbytes for v in pre[0].values()) / 1e6, 1),
        "workers": workers, "host_cores": os.cpu_count(),
        "device_bound_clips_per_s": round(ctrl_cps, 1),
        "data_wait_fraction": round(e2e_wait / e2e_wall, 3),
        "host_clips_per_s_per_core": round(host_rate / max(workers, 1), 1),
        "required_cores_per_chip_projection": round(req_cores, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
