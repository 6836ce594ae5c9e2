"""Serving-bundle inference benchmark: latency/throughput of an exported
StableHLO bundle on the real TPU.

Completes the deploy story's numbers: export the ViT-B AVClassifier bundle
(serve.export_classifier — the linprobe/finetune serving surface), load it
back code-free, and measure end-to-end inference at a fixed batch with the
single-dispatch chain methodology (per-call timing through the axon tunnel
under-reports 10-40x; see bench.py).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Usage: python bench_serve.py [batch=64] [iters=100] [--q8]
"""
import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    q8 = "--q8" in sys.argv                   # int8 weight-only bundle
    batch = int(argv[0]) if argv else 64
    iters = int(argv[1]) if len(argv) > 1 else 100

    import jax
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime, serve
    runtime.setup()
    from deepavfusion_tpu.models.classifier import AVClassifier
    from deepavfusion_tpu.models.deepavfusion import DeepAVFusionConfig
    from deepavfusion_tpu.models.vit import vit_config

    cfg = DeepAVFusionConfig(
        image=vit_config("vit_base", (224, 224), 3),
        audio=vit_config("vit_base", (128, 192), 1),
        num_fusion_tkns=(16, 8, 8), fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25, fusion_num_heads=12,
    )
    model = AVClassifier(cfg, num_classes=309, freeze_encoder=False,
                         input_norm=False, dtype=jnp.bfloat16)
    with jax.default_device(runtime.host_cpu_device()):
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, 224, 224, 3)),
                            jnp.zeros((1, 128, 192, 1)))["params"]

    out_dir = os.path.join(tempfile.gettempdir(),
                           "davf_bench_bundle_q8" if q8 else "davf_bench_bundle")
    t0 = time.perf_counter()
    serve.export_classifier(model, params, out_dir, batch=batch,
                            quantize="int8" if q8 else None)
    export_s = time.perf_counter() - t0

    size_mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out_dir) for f in fs) / 1e6

    t0 = time.perf_counter()
    bundle = serve.load_bundle(out_dir)
    load_s = time.perf_counter() - t0

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(batch, 128, 192, 1), jnp.float32)

    # chain iters inferences in ONE dispatch: fold the logits back into the
    # input so XLA cannot elide repeats (tunnel-safe timing, bench.py).
    # Params are an explicit jit ARGUMENT — closing over them would inline
    # the whole 330M-param tree as literal constants in the lowered module
    # (measured: 2.15 GB of StableHLO for one call), which the remote
    # compile service rejects with HTTP 413.
    call = bundle._call

    def chain(p, image, audio):
        def body(c, _):
            li, la, lf = call(p, c, audio)
            bump = (li + la + lf).mean() * 1e-6
            return c + bump.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, image, None, length=iters)
        return out

    f = jax.jit(chain)
    out = f(bundle._params, img, aud)
    _ = np.asarray(jax.device_get(out.ravel()[0]))   # compile + warm
    t0 = time.perf_counter()
    out = f(bundle._params, img, aud)
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": ("served AVClassifier inference (StableHLO bundle"
                   + (", int8 weights)" if q8 else ")")),
        "value": round(batch / dt, 1),
        "unit": "clips/s/chip",
        "vs_baseline": 1.0,
        "latency_ms_batch": round(dt * 1e3, 2),
        "batch": batch,
        "iters_per_dispatch": iters,
        "bundle_mb": round(size_mb, 1),
        "export_s": round(export_s, 1),
        "bundle_load_s": round(load_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
