"""walkgpt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
rafiibnsultan/WalkGPT: pixel-grounded vision-language modeling for pedestrian-accessibility
navigation.

Designed from scratch for TPU hardware:
  * pure-functional models over parameter pytrees (jit/pjit/shard_map friendly)
  * Pallas flash attention for the LLM decoder and SAM ViT encoder
  * SPMD sharding over a jax.sharding.Mesh (dp x tp), XLA collectives on ICI
  * static-shape decode loop with a persistent HBM KV cache

Layout:
  core/      config dataclasses, functional nn primitives, dtype policy, rng
  ops/       attention (reference + Pallas kernels), norms, resize, sampling
  models/    sam encoder/prompt/decoder, clip vit, unified llm decoder, msqp, ctp, walkgpt
  data/      PAVE pipeline, conversations, tokenizer, collate, task datasets
  parallel/  mesh + sharding rules, ZeRO-style optimizer sharding
  runtime/   train/eval drivers, greedy decode engine, checkpoint io + converters
  eval/      IoU metrics, Hungarian matcher, meters
"""

__version__ = "0.1.0"
