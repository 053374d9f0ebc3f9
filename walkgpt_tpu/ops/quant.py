"""Weight-only int8 quantization for bandwidth-bound decode.

Greedy decode reads every LLM weight once per token, so on v5e the decode
floor is (bytes of weights)/(HBM bandwidth). Symmetric per-output-channel
int8 halves those bytes vs bf16 at negligible quality cost (weight-only;
activations and accumulation stay bf16/fp32). This replaces the reference's
optional bitsandbytes 4/8-bit paths (SURVEY §2.6) with a TPU-native scheme.

A quantized projection is stored as {"w_q": int8 (in, out), "w_scale": f32
(out,)} (+ optional bias); core.nn.linear and the LLM _proj dispatch on the
presence of "w_q".
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in, out) float -> symmetric per-out-channel int8 + f32 scale."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)               # per out channel
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": q, "w_scale": scale.astype(jnp.float32)}


def quantized_linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(w_q); int8 weights are read from HBM, upcast in VMEM."""
    w = p["w_q"].astype(x.dtype)
    y = (x @ w) * p["w_scale"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _is_proj(d: Any) -> bool:
    return isinstance(d, dict) and "w" in d and getattr(d["w"], "ndim", 0) == 2


def quantized_llm_init(key, cfg, dtype=None, *, jit_layer=True,
                       act_quant: bool = False,
                       mlp_int4: bool = False,
                       attn_int4: bool = False,
                       attn_int4_proj: bool = False,
                       head_int4: bool = False,
                       quantize_lm_head: bool = True) -> Dict:
    """Random-init an int8-quantized LLM directly on the default device,
    one layer at a time: each layer's bf16 weights exist only transiently
    (freed after quantization), so a 7B/13B int8 model can be built on a
    16 GB chip without ever holding the full bf16 tree in HBM — and without
    shipping gigabytes over a (slow, tunneled) host->device link the way a
    host-side init + device_put would.

    mlp_int4=True packs the MLP projections as nibble-packed int4 for the
    one-launch fused decode kernel (ops/int4.py) — 0.5 bytes/param on the
    decode loop's dominant weight traffic; attention/lm_head stay int8."""
    import jax
    import jax.numpy as jnp
    from ..models import llm as llm_mod

    dtype = dtype or jnp.bfloat16
    keys = jax.random.split(key, cfg.num_layers + 3)

    def build_one(k):
        layer = llm_mod.init_layer(k, cfg, dtype)
        if attn_int4_proj:
            layer["attn"] = convert_attn_int4_proj(layer["attn"])
        elif attn_int4:
            layer["attn"] = convert_attn_int4(layer["attn"], act_quant)
        elif act_quant:
            layer["attn"] = convert_attn_qkv8(layer["attn"], act_quant)
        else:
            layer["attn"] = {kk: (convert_proj(v, act_quant) if _is_proj(v)
                                  else v)
                             for kk, v in layer["attn"].items()}
        if mlp_int4:
            layer["mlp"] = convert_mlp_int4(layer["mlp"])
        else:
            layer["mlp"] = {kk: (convert_proj(v, act_quant) if _is_proj(v)
                                 else v)
                            for kk, v in layer["mlp"].items()}
        return layer

    if jit_layer:
        build_one = jax.jit(build_one)
    layers = []
    for i in range(cfg.num_layers):
        layers.append(jax.block_until_ready(build_one(keys[i])))

    from ..core import nn

    def norm_init():
        return (nn.rms_norm_init(cfg.hidden_size, dtype) if cfg.norm == "rmsnorm"
                else nn.layer_norm_init(cfg.hidden_size, dtype))

    params = {
        "embed_tokens": nn.embedding_init(keys[-3], cfg.vocab_size,
                                          cfg.hidden_size, dtype=dtype),
        "layers": layers,
        "final_norm": norm_init(),
    }
    if not cfg.tie_embeddings:
        head = nn.linear_init(keys[-2], cfg.hidden_size, cfg.vocab_size,
                              bias=False, dtype=dtype)
        if not quantize_lm_head:
            params["lm_head"] = head           # stays dense (QLoRA: trained)
        elif head_int4:
            from . import int4 as int4_lib
            params["lm_head"] = int4_lib.quantize_weight4(head["w"],
                                                          pad_to=128)
        else:
            params["lm_head"] = convert_proj(head, act_quant)
    return params


def convert_mlp_int4(mlp: Dict) -> Dict:
    """Pack an MLP param dict for the fused int4 decode kernel
    (ops/int4.fused_mlp_int4): gate/up (or fc1) -> half-pair packed
    {"w_p4", "w_scale"}; down (or fc2) -> tile-local packed {"w_p4t", ...}.
    Falls back to the dict unchanged when a projection has a bias (the int4
    kernel is bias-free; LLaMA/MPT MLPs have no biases) or an odd dim."""
    from . import int4 as int4_lib
    first = "gate" if "gate" in mlp else "fc1"
    last = "down" if "down" in mlp else "fc2"
    if any("b" in mlp[k] for k in mlp if isinstance(mlp[k], dict)):
        return {k: (convert_proj(v) if _is_proj(v) else v)
                for k, v in mlp.items()}
    w_last = mlp[last]["w"]
    if w_last.shape[0] % 2 or mlp[first]["w"].shape[0] % 2:
        return {k: (convert_proj(v) if _is_proj(v) else v)
                for k, v in mlp.items()}
    out = {}
    for k, v in mlp.items():
        if k == last:
            out[k] = int4_lib.pack_down4(v["w"])
        elif _is_proj(v):
            out[k] = int4_lib.quantize_weight4(v["w"])
        else:
            out[k] = v
    return out


def convert_attn_int4(attn: Dict, act_quant: bool = True) -> Dict:
    """Pack q/k/v into ONE concatenated int4 projection ("qkv4") decoded by
    a single Pallas launch per step (ops/int4.int4_matmul_pallas); the o
    projection stays int8 (a lone int4 launch loses to W8A8 at its size).
    Falls back to per-projection int8 when biases or LoRA leaves are present
    (int4 is an inference-only deployment format; merge LoRA first)."""
    from . import int4 as int4_lib
    import jax.numpy as jnp
    qkv = [attn.get(k) for k in ("q", "k", "v")]
    if (not all(_is_proj(p) for p in qkv)
            or any("b" in p or "lora_a" in p for p in qkv)
            or attn["q"]["w"].shape[0] % 2):
        return {k: (convert_proj(v, act_quant) if _is_proj(v) else v)
                for k, v in attn.items()}
    w = jnp.concatenate([p["w"] for p in qkv], axis=1)
    out = {"qkv4": int4_lib.quantize_weight4(w)}
    for k, v in attn.items():
        if k in ("q", "k", "v"):
            continue
        out[k] = convert_proj(v, act_quant) if _is_proj(v) else v
    return out


def convert_attn_int4_proj(attn: Dict) -> Dict:
    """PER-PROJECTION packed-int4 attention (q/k/v/o each {"w_p4",
    "w_scale"}, core.nn.linear's dual-dot path) — the QLoRA-compatible int4
    base: unlike convert_attn_int4's fused "qkv4", the projections stay
    separate dicts, so checkpoint.init_lora can attach r=8 adapters to
    q/v and models/llm._proj adds the low-rank path on top. Halves the
    13B attention base vs int8 (4.2 -> 2.1 GB) — the margin that lets the
    QLoRA train step fit one 16 GB chip. Falls back to int8 for biased
    projections (int4 paths are bias-free)."""
    from . import int4 as int4_lib
    out = {}
    for k, v in attn.items():
        if _is_proj(v) and "b" not in v and v["w"].shape[0] % 2 == 0:
            extra = {kk: vv for kk, vv in v.items() if kk != "w"}
            out[k] = dict(int4_lib.quantize_weight4(v["w"]), **extra)
        elif _is_proj(v):
            out[k] = convert_proj(v)
        else:
            out[k] = v
    return out


def convert_attn_qkv8(attn: Dict, act_quant: bool = True) -> Dict:
    """Fuse q/k/v into ONE concatenated int8 projection ("qkv8"): the W8A8
    decode step then quantizes the activation once and runs one int8 MXU dot
    instead of three (same weight bytes, one pass over the activation).
    Falls back to per-projection int8 when biases or LoRA leaves are present."""
    import jax.numpy as jnp
    qkv = [attn.get(k) for k in ("q", "k", "v")]
    if (not all(_is_proj(p) for p in qkv)
            or any("b" in p or "lora_a" in p for p in qkv)):
        return {k: (convert_proj(v, act_quant) if _is_proj(v) else v)
                for k, v in attn.items()}
    w = jnp.concatenate([p["w"] for p in qkv], axis=1)
    out = {"qkv8": convert_proj({"w": w}, act_quant)}
    for k, v in attn.items():
        if k in ("q", "k", "v"):
            continue
        out[k] = convert_proj(v, act_quant) if _is_proj(v) else v
    return out


def convert_proj(d: Dict, act_quant: bool = False) -> Dict:
    """Quantize one {w[, b]} projection dict in place-shape. act_quant=True
    additionally marks the projection for dynamic per-token int8 activations
    (W8A8): core.nn.linear then runs a native int8xint8->int32 MXU dot,
    which skips the per-element weight dequant that bounds weight-only int8
    decode on the VPU (~3.5 ms per 7B step at batch 8)."""
    out = {k: v for k, v in d.items() if k != "w"}
    out.update(quantize_weight(d["w"]))
    if act_quant:
        out["a8"] = True
    return out


def quantize_sam_encoder(sam_params: Dict, act_quant: bool = False) -> Dict:
    """int8-quantize the SAM ViT encoder's block projections (qkv, proj,
    mlp fc1/fc2 — the ~0.6B-param bulk of ViT-H). Patch embed, neck convs,
    norms, rel-pos tables, prompt encoder, and mask decoder stay full
    precision (tiny). Frees ~0.6 GB of HBM at ViT-H scale — headroom the
    7B/13B single-chip configs spend on decode batch; all projections flow
    through core.nn.linear, which dispatches on the quantized leaves."""
    p = {k: v for k, v in sam_params.items()}
    enc = {k: v for k, v in p["image_encoder"].items()}
    blocks = []
    for blk in enc["blocks"]:
        nb = dict(blk)
        for name in ("qkv", "proj"):
            if _is_proj(nb.get(name)):
                nb[name] = convert_proj(nb[name], act_quant)
        nb["mlp"] = {k: (convert_proj(v, act_quant) if _is_proj(v) else v)
                     for k, v in blk["mlp"].items()}
        blocks.append(nb)
    enc["blocks"] = blocks
    p["image_encoder"] = enc
    return p


def quantize_llm(llm_params: Dict, *, quantize_embeddings: bool = False,
                 act_quant: bool = False, mlp_int4: bool = False,
                 attn_int4: bool = False, attn_int4_proj: bool = False,
                 head_int4: bool = False,
                 quantize_lm_head: bool = True) -> Dict:
    """int8-quantize all 2-D projection weights of an LLM param tree
    (attention q/k/v/o, MLP, lm_head; embeddings optional — the embedding
    gather reads one row per token, so quantizing it saves little).
    mlp_int4/attn_int4/head_int4 pack those groups as int4 instead
    (ops/int4.py; attn_int4 fuses q/k/v into one packed projection).
    quantize_lm_head=False keeps the head dense — required when it stays
    TRAINABLE (QLoRA: the reference recipe trains lm_head + embed_tokens
    alongside the adapters, train_walkgpt.py:347-359)."""
    p = {k: v for k, v in llm_params.items()}
    p["layers"] = []
    for layer in llm_params["layers"]:
        new_layer = dict(layer)
        if attn_int4_proj:
            new_layer["attn"] = convert_attn_int4_proj(layer["attn"])
        elif attn_int4:
            new_layer["attn"] = convert_attn_int4(layer["attn"], act_quant)
        elif act_quant:
            new_layer["attn"] = convert_attn_qkv8(layer["attn"], act_quant)
        else:
            new_layer["attn"] = {k: (convert_proj(v, act_quant) if _is_proj(v)
                                     else v) for k, v in layer["attn"].items()}
        if mlp_int4:
            new_layer["mlp"] = convert_mlp_int4(layer["mlp"])
        else:
            new_layer["mlp"] = {k: (convert_proj(v, act_quant) if _is_proj(v)
                                    else v) for k, v in layer["mlp"].items()}
        p["layers"].append(new_layer)
    if "lm_head" in p and _is_proj(p["lm_head"]) and quantize_lm_head:
        if head_int4:
            from . import int4 as int4_lib
            p["lm_head"] = int4_lib.quantize_weight4(p["lm_head"]["w"],
                                                     pad_to=128)
        else:
            p["lm_head"] = convert_proj(p["lm_head"], act_quant)
    if quantize_embeddings and _is_proj(p.get("embed_tokens", {})):
        p["embed_tokens"] = convert_proj(p["embed_tokens"])
    return p
