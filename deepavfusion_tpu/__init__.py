"""DeepAVFusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) audio-visual early-fusion
masked-modeling framework.

A from-scratch rebuild of the capabilities of stoneMo/DeepAVFusion (CVPR 2024,
"Unveiling the Power of Audio-Visual Early Fusion Transformers with Dense
Interactions through Masked Modeling") designed TPU-first:

  * functional flax.linen models over parameter pytrees, PRNG-key threading
  * one jitted train step per task (forward + loss + grad + optax update),
    gradient accumulation as ``lax.scan`` over microbatches
  * SPMD data parallelism via ``jax.sharding.Mesh`` + NamedSharding; XLA emits
    all collectives over ICI from sharding annotations
  * bf16 compute / f32 params; Pallas fused attention kernels on TPU with a
    pure-XLA fallback for CPU testing
  * host-side media decode (C++ FFmpeg stage) feeding fixed-shape batches

Reference parity surface (see SURVEY.md): models/{vits,fusion_blocks,
deepavfusion,avmae,swin,classifier,avsegm,avsrcsep,video_vits,
video_earlyfusion}.py, train.py and the eval_{linprobe,finetune,avsegm,
avsrcsep} entry points, Hydra-style configs, and checkpoint loading of the
released ViT-B weights through a converter.
"""

__version__ = "0.1.0"
