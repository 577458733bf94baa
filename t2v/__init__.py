"""t2v — TPU-native text-to-video inference framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
`kabachuha/sd-webui-text2video` A1111 extension (reference at /root/reference),
designed TPU-first: NHWC layouts, bf16 MXU matmuls, Pallas flash attention,
`lax.scan`-compiled sampler loops with fused classifier-free guidance, and
`jax.sharding` parallelism over device meshes.

Subpackages:
  core      — configs, dtype policy, RNG helpers
  parallel  — mesh construction, sharding rules, distributed training step
  io        — torch-free checkpoint readers (.pth zip-pickle, safetensors)
  text      — CLIP BPE tokenizer, A1111-style prompt parsing, text towers
  models    — Flax UNets (ModelScope, VideoCrafter) and the KL-VAE
  kernels   — Pallas TPU kernels (flash attention) + XLA fallbacks
  diffusion — schedules and samplers (DDIM_Gaussian, DDIM, UniPC)
  pipeline  — model loading, end-to-end inference, LoRA, keyframe DSL
  media     — ffmpeg stitching, frame IO, metadata (host-side)
  api       — FastAPI app mirroring the reference /t2v/run schema
  cli       — generation CLI
"""

__version__ = "0.1.0"
