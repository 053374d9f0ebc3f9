"""Per-compile XLA option overrides for the TPU decode/eval programs.

The TPU backend's HLO rematerialization pass is tuned for training graphs;
on the big inference pipeline (SAM encode + 512-step greedy decode + mask
tail in ONE program) it mis-fires: with an int8 KV cache it marks the
per-token scale buffers as compression candidates and inserts
compress/uncompress copies of BOTH full scale tensors into EVERY decode
scan iteration. Measured on v5e (7B int4-LLM, int8 KV, batch 16, 512-token
budget, 2026-08-18):

    default remat:            33.1 s/batch   (f32 scales)
    bf16 scales:              21.7 s/batch   (compression halves, persists)
    remat disabled (here):    10.1 s/batch   — and peak temp memory DROPS
                              (5.96 GB vs 6.13 GB with remat "savings")

Setting xla_tpu_rematerialization_min_size_in_bytes to a huge value makes
no buffer eligible, disabling the pass per-compile without touching global
XLA flags (the terminal owns LIBTPU_INIT_ARGS; jit(compiler_options=...)
is forwarded per-compile and validated by PJRT).

Trade-off: programs that genuinely needed remat to fit now fail to compile
instead of running degraded. Every shipped config is measured to fit; set
WALKGPT_TPU_REMAT=default to restore the stock pass if a custom config
OOMs at compile time.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

_HUGE = "999999999999"


def decode_compiler_options() -> Optional[Dict[str, str]]:
    """Compiler options for the big single-program inference pipelines.
    Returns None on non-TPU backends (option names are backend-checked)."""
    if os.environ.get("WALKGPT_TPU_REMAT", "off") == "default":
        return None
    try:
        import jax
        plat = jax.devices()[0].platform.lower()
    except Exception:                                  # pragma: no cover
        return None
    if plat not in ("tpu", "axon"):
        return None
    return {"xla_tpu_rematerialization_min_size_in_bytes": _HUGE}
