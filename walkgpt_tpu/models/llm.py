"""Unified transformer LLM decoder, TPU-native.

One implementation covers the reference's three vendored backbones
(SURVEY §2.3):
  * LLaMA  (model/llava_walkgpt/model/language_model/llava_llama.py)  —
    RoPE + RMSNorm + SiLU-gated MLP, no biases;
  * MPT    (language_model/mpt/*) — ALiBi + LayerNorm + GELU MLP, tied
    embeddings;
  * StableLM-Epoch (language_model/stablelm/*) — partial RoPE (rope_pct) +
    LayerNorm + SiLU-gated MLP + GQA (`repeat_kv`).

TPU design:
  * pure functions over a param pytree — jit/pjit/shard_map friendly; the
    decode loop is a `lax.scan` over a preallocated HBM KV cache with static
    shapes (no dynamic lengths inside jit);
  * attention routes through the shared `mha` primitive (fp32 softmax) and
    swaps to the Pallas flash kernel for long prefills;
  * inputs are *embeddings*, not ids — the multimodal layer splices visual
    tokens before calling in (llava_arch.py prepare_inputs_labels_for_multimodal
    equivalent lives in models/walkgpt.py).

Optional LoRA (r on q/v projections, reference train_walkgpt.py:263-305) is a
parallel low-rank path applied when "lora_a"/"lora_b" are present on a
projection; the merge transform lives in runtime/checkpoint.py.
"""
from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# route W8A8 MLPs through the one-launch Pallas int8 kernel at decode row
# counts (ops/int4.fused_mlp_int8). In-program A/B at 7B/batch16/64 steps
# (bench_decode, v5e 2026-08-17): ON 1169 ms vs OFF 1219 ms — the single
# launch beats XLA's 3-dot + quantize sequencing inside the decode scan,
# even though the same kernel measures ~10% SLOWER in an isolated loop.
_FUSED_MLP8 = os.environ.get("WALKGPT_FUSED_MLP8", "1") == "1"

from ..core import nn
from ..core.config import LLMConfig
from ..ops.attention import merge_heads, mha, split_heads

Params = Dict


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_layer(key, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    """One decoder layer's params (also used for incremental on-device init
    of quantized large models, ops/quant.quantized_llm_init)."""
    kv_dim = cfg.num_kv_heads * cfg.head_dim

    def norm_init():
        return (nn.rms_norm_init(cfg.hidden_size, dtype) if cfg.norm == "rmsnorm"
                else nn.layer_norm_init(cfg.hidden_size, dtype))

    k = jax.random.split(key, 8)
    layer = {
        "input_norm": norm_init(),
        "attn": {
            "q": nn.linear_init(k[0], cfg.hidden_size, cfg.hidden_size,
                                bias=cfg.qkv_bias, dtype=dtype),
            "k": nn.linear_init(k[1], cfg.hidden_size, kv_dim,
                                bias=cfg.qkv_bias, dtype=dtype),
            "v": nn.linear_init(k[2], cfg.hidden_size, kv_dim,
                                bias=cfg.qkv_bias, dtype=dtype),
            "o": nn.linear_init(k[3], cfg.hidden_size, cfg.hidden_size,
                                bias=cfg.qkv_bias, dtype=dtype),
        },
        "post_norm": norm_init(),
    }
    if cfg.act == "silu":
        layer["mlp"] = {
            "gate": nn.linear_init(k[4], cfg.hidden_size, cfg.intermediate_size,
                                   bias=cfg.mlp_bias, dtype=dtype),
            "up": nn.linear_init(k[5], cfg.hidden_size, cfg.intermediate_size,
                                 bias=cfg.mlp_bias, dtype=dtype),
            "down": nn.linear_init(k[6], cfg.intermediate_size, cfg.hidden_size,
                                   bias=cfg.mlp_bias, dtype=dtype),
        }
    else:
        layer["mlp"] = {
            "fc1": nn.linear_init(k[4], cfg.hidden_size, cfg.intermediate_size,
                                  dtype=dtype),
            "fc2": nn.linear_init(k[5], cfg.intermediate_size, cfg.hidden_size,
                                  dtype=dtype),
        }
    return layer


def init(key, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 3)

    def norm_init():
        return (nn.rms_norm_init(cfg.hidden_size, dtype) if cfg.norm == "rmsnorm"
                else nn.layer_norm_init(cfg.hidden_size, dtype))

    layers = [init_layer(keys[i], cfg, dtype) for i in range(cfg.num_layers)]

    params = {
        "embed_tokens": nn.embedding_init(keys[-3], cfg.vocab_size,
                                          cfg.hidden_size, dtype=dtype),
        "layers": layers,
        "final_norm": norm_init(),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = nn.linear_init(keys[-2], cfg.hidden_size,
                                           cfg.vocab_size, bias=False, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# position encodings
# ---------------------------------------------------------------------------

def rope_tables(cfg: LLMConfig, positions: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the rotary dims. positions: [B, T] int32.
    Returns cos, sin: [B, T, rot_dim/2] fp32."""
    rot_dim = int(cfg.head_dim * cfg.rope_pct)
    inv_freq = 1.0 / (cfg.rope_theta **
                      (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq   # [B, T, rot/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               rot_dim: int) -> jnp.ndarray:
    """x: [B, H, T, D]; HF LLaMA rotate-half convention on the first rot_dim dims."""
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    cos = cos[:, None].astype(x.dtype)    # [B, 1, T, rot/2]
    sin = sin[:, None].astype(x.dtype)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if rot_dim < x.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi slopes (powers of 2^(-8/n), with the non-power-of-two
    interleave fallback)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]
    if math.log2(num_heads).is_integer():
        s = pow2_slopes(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        s = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
        s = s + extra
    return jnp.array(s, jnp.float32)


def alibi_bias(cfg: LLMConfig, q_pos: jnp.ndarray, k_pos: jnp.ndarray) -> jnp.ndarray:
    """[H, Tq, Tk] additive bias: -slope * (q - k), 0 on/above the diagonal."""
    slopes = alibi_slopes(cfg.num_heads)
    dist = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)
    dist = jnp.maximum(dist, 0.0)
    return -slopes[:, None, None] * dist[None]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _norm(p, x, cfg: LLMConfig):
    if cfg.norm == "rmsnorm":
        return nn.rms_norm(p, x, eps=cfg.norm_eps)
    return nn.layer_norm(p, x, eps=cfg.norm_eps)


def _amax_reduce_for(tp_axis: Optional[str]):
    """Global-amax reduction for W8A8 activation quantization on ROW-parallel
    projections under manual tp (core.nn.linear amax_reduce): pmax over the
    tp axis recovers the single-device per-token absmax, so every shard
    quantizes with identical codes. None (no tp) -> no hook."""
    if tp_axis is None:
        return None
    return lambda ax: jax.lax.pmax(ax, tp_axis)


def _proj(p, x, amax_reduce=None):
    y = nn.linear(p, x, amax_reduce=amax_reduce)
    if "lora_a" in p:
        scale = p.get("lora_scale", 1.0)
        # keep the activation dtype: a f32 lora_scale leaf must not upcast a
        # bf16 residual stream
        y = y + ((x @ p["lora_a"]) @ p["lora_b"] * scale).astype(y.dtype)
    return y


def _mlp(p, x, cfg: LLMConfig, tp_axis: Optional[str] = None):
    inner = p.get("down", p.get("fc2", {}))
    if "w_p4t" in inner:
        # nibble-packed int4 MLP: ONE fused Pallas launch per decode step
        # (0.5 bytes/param weight reads), XLA dual-dots for full sequences.
        # Weight-only (float activations), so under manual tp the row-sliced
        # down dot differs from single-chip only by f32 sum reassociation.
        from ..ops.int4 import mlp_int4
        return mlp_int4(p, x, cfg.act)
    if (isinstance(inner, dict) and "a8" in inner and _FUSED_MLP8
            and tp_axis is None):
        # W8A8 MLP: ONE fused Pallas launch with int8 dots for decode rows;
        # per-projection XLA int8 dots for full sequences (fused_mlp_int8
        # returns None there). WALKGPT_FUSED_MLP8=0 restores the XLA path.
        # Under manual tp the XLA path runs instead: the fused kernel
        # requantizes the intermediate per (row, tile_for(I_local)) group,
        # which re-bins differently from the single-chip tiling whenever
        # tile_for(I/tp) != tile_for(I) — the XLA path with a global-amax
        # hook keeps every shard's codes equal to the single-chip program.
        from ..ops.int4 import fused_mlp_int8, mlp_is_w8a8
        if mlp_is_w8a8(p):
            y = fused_mlp_int8(p, x, cfg.act)
            if y is not None:
                return y
    red = _amax_reduce_for(tp_axis)
    if cfg.act == "silu":
        return nn.linear(p["down"],
                         jax.nn.silu(nn.linear(p["gate"], x)) * nn.linear(p["up"], x),
                         amax_reduce=red)
    return nn.linear(p["fc2"], nn.gelu_exact(nn.linear(p["fc1"], x)),
                     amax_reduce=red)


def _qkv_proj(p, x, cfg: LLMConfig):
    """q/k/v projections; with int4-fused attention ("qkv4",
    ops/quant.convert_attn_int4) the three run as ONE packed int4 matmul —
    a single Pallas launch per decode step, single HBM read of the packed
    bytes (falls back to XLA dual-dots for prefill row counts)."""
    if "qkv4" in p:
        from ..ops.int4 import int4_matmul_pallas
        qkv = int4_matmul_pallas(x, p["qkv4"]["w_p4"], p["qkv4"]["w_scale"])
        hq = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        return qkv[..., :hq], qkv[..., hq:hq + kvd], qkv[..., hq + kvd:]
    if "qkv8" in p:
        # fused W8A8 q/k/v: ONE activation quantize + ONE int8 MXU dot
        # (ops/quant.convert_attn_qkv8)
        qkv = nn.linear(p["qkv8"], x)
        hq = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        return qkv[..., :hq], qkv[..., hq:hq + kvd], qkv[..., hq + kvd:]
    return _proj(p["q"], x), _proj(p["k"], x), _proj(p["v"], x)


def _psum_tp(x: jnp.ndarray, tp_axis: Optional[str]) -> jnp.ndarray:
    """Megatron-style tensor-parallel reduction point. Inside a shard_map
    over `tp_axis`, the attention o-projection and the MLP down-projection
    are ROW-parallel (their inputs are head-/intermediate-sharded), so each
    device holds a partial sum of the residual-stream contribution — psum
    makes the residual replicated again. tp_axis=None (the single-chip and
    GSPMD paths) is the identity: GSPMD inserts its own collectives."""
    return x if tp_axis is None else jax.lax.psum(x, tp_axis)


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, n_kv, T, D] -> [B, n_kv*n_rep, T, D] (GQA repeat)."""
    if n_rep == 1:
        return x
    b, h, t, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, t, d)).reshape(
        b, h * n_rep, t, d)


def _attention(p, cfg: LLMConfig, x: jnp.ndarray, *,
               positions: jnp.ndarray,
               mask: Optional[jnp.ndarray],
               bias: Optional[jnp.ndarray],
               kv_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               flash_fn=None,
               key_valid: Optional[jnp.ndarray] = None,
               tp_axis: Optional[str] = None,
               ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Self-attention. Returns (output, (k, v)) where k/v are the *new* keys/
    values in [B, n_kv, T, D] (pre-repeat, post-rope) for cache writing.
    kv_override replaces K/V with cached tensors (decode step).
    flash_fn: fn(q, k, v, key_valid) implementing *causal* attention — used
    for full-sequence forwards without an explicit bias (the Pallas kernel)."""
    b, t, _ = x.shape
    qp, kp, vp = _qkv_proj(p, x, cfg)
    q = split_heads(qp, cfg.num_heads)
    k = split_heads(kp, cfg.num_kv_heads)
    v = split_heads(vp, cfg.num_kv_heads)

    if cfg.pos_emb == "rope":
        rot_dim = int(cfg.head_dim * cfg.rope_pct)
        cos, sin = rope_tables(cfg, positions)
        q = apply_rope(q, cos, sin, rot_dim)
        k = apply_rope(k, cos, sin, rot_dim)

    new_kv = (k, v)
    if kv_override is not None:
        k, v = kv_override

    n_rep = cfg.num_heads // cfg.num_kv_heads
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)

    if flash_fn is not None and bias is None and kv_override is None:
        out = flash_fn(q, k, v, key_valid)
    else:
        out = mha(q, k, v, mask=mask, bias=bias)
    return nn.linear(p["o"], merge_heads(out),
                     amax_reduce=_amax_reduce_for(tp_axis)), new_kv


def _block(p, cfg: LLMConfig, x, tp_axis: Optional[str] = None, **attn_kw):
    h, new_kv = _attention(p["attn"], cfg, _norm(p["input_norm"], x, cfg),
                           tp_axis=tp_axis, **attn_kw)
    x = x + _psum_tp(h, tp_axis)
    x = x + _psum_tp(_mlp(p["mlp"], _norm(p["post_norm"], x, cfg), cfg,
                          tp_axis=tp_axis), tp_axis)
    return x, new_kv


def lm_logits(params: Params, cfg: LLMConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_embeddings:
        return hidden @ params["embed_tokens"]["w"].T
    head = params["lm_head"]
    if "w_p4" in head and "b" not in head:
        # single-launch packed-int4 head for decode rows (pallas); XLA
        # dual-dot fallback for full sequences lives inside the helper.
        # The packed head may be zero-padded to a 128-multiple vocab
        # (quantize_weight4 pad_to) — slice back to the logical vocab.
        from ..ops.int4 import int4_matmul_pallas
        logits = int4_matmul_pallas(hidden, head["w_p4"], head["w_scale"])
        return logits[..., : cfg.vocab_size]
    return nn.linear(head, hidden)   # dense, int8, or int4 dual-dot


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return nn.embed(params["embed_tokens"], ids)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int,
                  dtype=jnp.float32, quant=False,
                  layout: str = "heads") -> Params:
    """quant selects the cache element type: False/None = `dtype`;
    True/"int8" = int8 with per-row (token) fp32 scales — halves decode-time
    cache HBM reads; "int4" = int4 rows (KIVI-class quantization).

    MEASURED VERDICT (v5e, 2026-08): int8 is the production choice. XLA
    fuses the int8->bf16 convert into the attention dot (cache streams at
    byte rate: 7B decode -6%, 1.00 -> 1.06 img/s e2e). The int4 convert is
    NOT fused — XLA materializes a dequantized copy per layer per step
    (~0.9 ms/row extra at 7B; a bitcast-based int4 weight path measured the
    same unpack-bound behavior AND miscompiled dot values on this platform),
    so "int4" costs more than it saves today. Kept as the format option for
    toolchains with native int4 dot support; int4 buffers never cross a jit
    boundary here, so the axon int4 transfer bug does not apply.

    layout="flat" stores [layers, B, L, n_kv*D] instead of
    [layers, B, n_kv, L, D]: contiguous 4-8 KB rows that the fused Pallas
    decode-attention kernels stream at full HBM bandwidth (the heads layout's
    256 B rows read at ~60% of peak). Quantized flat caches pair with
    ops/flash_attention.decode_attention_q (in-VMEM dequant; the XLA
    block-diagonal formulation materialized a bf16 cache copy per layer per
    step — 35.4 s/batch16 at 7B, 2026-08-18): values are int8 rows, or for
    quant="int4" NIBBLE-PACKED pairs [layers, B, L, n_kv*D/2] int8 (the
    jnp.int4 dtype the heads layout uses never crosses into Pallas); scales
    are [layers, B, n_kv, L] so the kernel's per-head scale row is a native
    lane vector AND the lane dim is L, not n_kv (the [.., L, n_kv] order
    lane-pads n_kv 32 -> 128 = 4x the scale HBM). decode_step dispatches on
    the rank."""
    if layout == "flat":
        kd = cfg.num_kv_heads * cfg.head_dim
        if quant:
            pack4 = quant == "int4"
            shape = (cfg.num_layers, batch, max_len, kd // 2 if pack4 else kd)
            sshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len)
            return {"k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.zeros(sshape, jnp.bfloat16),
                    "v_scale": jnp.zeros(sshape, jnp.bfloat16)}
        shape = (cfg.num_layers, batch, max_len, kd)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if quant:
        qdt = jnp.int4 if quant == "int4" else jnp.int8
        # scales are [layers, B, n_kv, T] with NO trailing singleton: a
        # [..., T, 1] f32 tensor tiles its last two dims to (8, 128) on TPU —
        # a 128x physical lane-padding of every scale buffer that the decode
        # loop then re-streams per layer per step (measured as the 5x
        # 512-token decode collapse at 7B, 2026-08-18; the flat layout's
        # [..., T, n_kv] scales never had the singleton and never collapsed)
        sshape = shape[:-1]
        return {"k": jnp.zeros(shape, qdt), "v": jnp.zeros(shape, qdt),
                "k_scale": jnp.zeros(sshape, jnp.bfloat16),
                "v_scale": jnp.zeros(sshape, jnp.bfloat16)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _cache_is_flat(kv_cache: Params) -> bool:
    return kv_cache["k"].ndim == 4


def _quant_rows(x: jnp.ndarray, qdt=jnp.int8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., D] -> (int values, BF16 scale [..., 1]); symmetric per-row.
    qdt int8 -> +-127 levels, int4 -> +-7.

    Scales are bf16, and quantization divides by the ROUNDED scale so the
    stored (q, scale) pair is self-consistent. f32 scale buffers made TPU
    remat treat the cache scales as compression candidates: in HBM-tight
    programs it inserted f32<->bf16 compress/uncompress copies of BOTH full
    scale tensors into every decode-scan iteration (118 remat copies of
    f32[32,16,32,862] in the 7B/512-token HLO — the dominant cost of the
    33 s/batch collapse, 2026-08-18). bf16 buffers cannot be compressed
    further, so the pass leaves them alone; the scale value itself only
    needs ~1% precision."""
    qmax = 7.0 if qdt == jnp.int4 else 127.0
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = (jnp.maximum(amax, 1e-8) / qmax).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(xf / scale.astype(jnp.float32)), -qmax, qmax
                 ).astype(qdt)
    return q, scale


def _quant_pack4_flat(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., n_kv, D] -> (nibble-packed int8 [..., n_kv*D/2],
    bf16 scale [..., n_kv]). Per-(row, kv-head) symmetric int4 (+-7
    levels), divided by the ROUNDED bf16 scale like _quant_rows; packed in
    GLOBAL-HALVES order on the flattened [n_kv*D] row — byte j holds flat
    dims (j, j + n_kv*D/2) — so decode_attention_q's unpacked lo/hi planes
    are contiguous lane slices (a per-head interleave would need an
    in-kernel lane permutation of the query)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = (jnp.maximum(amax, 1e-8) / 7.0).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(xf / scale.astype(jnp.float32)), -7, 7
                 ).astype(jnp.int8)
    kd = x.shape[-2] * x.shape[-1]
    q = q.reshape(x.shape[:-2] + (kd,))
    lo, hi = q[..., : kd // 2], q[..., kd // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.int8)
    return packed, scale[..., 0]


def _cache_kv(kv_cache: Params, i, dtype, attend_len: Optional[int] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Layer i's K/V in compute dtype (dequantized when int8). attend_len
    restricts to the static prefix [0, attend_len) of the length axis."""
    al = slice(None) if attend_len is None else slice(0, attend_len)
    k, v = kv_cache["k"][i][:, :, al], kv_cache["v"][i][:, :, al]
    if "k_scale" in kv_cache:
        k = (k.astype(jnp.float32)
             * kv_cache["k_scale"][i][:, :, al, None]).astype(dtype)
        v = (v.astype(jnp.float32)
             * kv_cache["v_scale"][i][:, :, al, None]).astype(dtype)
    else:
        k, v = k.astype(dtype), v.astype(dtype)
    return k, v


def _int8_kv_decode_attention(q, k_q, ks, v_q, vs, key_mask, bias=None):
    """One-token attention over an int8 KV cache WITHOUT materializing a
    dequantized copy (the round-2 perf trap: _cache_kv wrote + re-read a full
    bf16 cache image per layer per step, models/llm.py r2:293-301).

    Scale folding: with per-row (token) symmetric scales,
        s[l]   = q . (k_q[l] * ks[l])  =  (q . k_q[l]) * ks[l]
        out[d] = sum_l p[l] * vs[l] * v_q[l, d]
    so both contractions run with the int8 tensor as a direct dot operand
    (XLA fuses the int8->bf16 convert into the dot read — the same pattern
    the weight-only int8 path relies on) and the scales apply OUTSIDE the
    dot. Cache HBM traffic halves vs a bf16 cache; numerics match _cache_kv
    up to float reassociation.

    q: [B, H, 1, D] (pre-scaled by caller? no — scaled here);
    k_q/v_q: [B, n_kv, L, D] int8; ks/vs: [B, n_kv, L] f32;
    key_mask: [B, L] bool. Returns [B, H, 1, D] in q.dtype.
    GQA: query head h reads kv head h // (H / n_kv)."""
    b, h, _, d = q.shape
    n_kv = k_q.shape[1]
    n_rep = h // n_kv
    scale = 1.0 / math.sqrt(d)
    qg = (q * scale).reshape(b, n_kv, n_rep, d)
    # [B, n_kv, n_rep, L] — contract D, batch (B, n_kv)
    s = jax.lax.dot_general(
        qg, k_q.astype(qg.dtype),
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    s = s * ks[:, :, None, :]                    # [B, n_kv, 1, L] row scales
    if bias is not None:                         # ALiBi [B, H, 1, L]
        l = k_q.shape[2]
        s = s + bias.reshape(b, n_kv, n_rep, l)
    s = jnp.where(key_mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vs[:, :, None, :]).astype(q.dtype)        # fold v scales into p
    # [B, n_kv, n_rep, D] — contract L, batch (B, n_kv)
    out = jax.lax.dot_general(
        pv, v_q.astype(pv.dtype),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)
    return out.reshape(b, h, 1, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------

def forward(params: Params, cfg: LLMConfig, inputs_embeds: jnp.ndarray, *,
            attention_mask: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            kv_cache: Optional[Params] = None,
            flash_fn=None,
            remat: bool = False,
            prefix_mask: Optional[jnp.ndarray] = None,
            seq_constrain=None,
            tp_axis: Optional[str] = None,
            ) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Full-sequence (training / prefill) forward.

    inputs_embeds: [B, T, H]; attention_mask: [B, T] bool (True = real token).
    remat=True rematerializes each block on the backward pass (the TPU
    equivalent of HF gradient_checkpointing_enable, train_walkgpt.py:245).
    prefix_mask: [B, T] bool — True marks the bidirectional-prefix region:
    prefix tokens attend each other in BOTH directions (the MPT prefix-LM
    capability; reference mpt/hf_prefixlm_converter.py implements it by
    surgically patching HF models — here it is just a mask rule).
    seq_constrain: optional fn(x: [B, T, H]) -> x applying a sharding
    constraint to the residual stream between blocks — Megatron-style
    sequence parallelism (parallel/sharding.seq_constrainer): the residual
    saved for backward is token-sharded over the tp axis, so XLA turns the
    tp all-reduces into reduce-scatter + all-gather pairs and activation
    memory scales 1/tp. Applied OUTSIDE the remat boundary so the stored
    residuals (not just the recompute) are sharded.
    tp_axis: mesh axis name when running MANUALLY tensor-parallel inside a
    shard_map (parallel/tp.py): params hold this device's head/intermediate
    shard, cfg carries LOCAL head counts, and o/down outputs psum over the
    axis (_psum_tp). None under jit/GSPMD.
    Returns (final-norm hidden states [B, T, H], updated kv_cache or None).
    """
    b, t, _ = inputs_embeds.shape
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(attention_mask.astype(jnp.int32).cumsum(-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    causal = jnp.tril(jnp.ones((t, t), bool))
    mask = causal[None, None]
    if prefix_mask is not None:
        bidir = prefix_mask[:, None, :, None] & prefix_mask[:, None, None, :]
        mask = mask | bidir
        flash_fn = None          # the flash kernel is causal-only
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :]

    bias = None
    if cfg.pos_emb == "alibi":
        if tp_axis is not None:
            raise NotImplementedError(
                "manual tp: ALiBi slopes index GLOBAL heads; shard the "
                "slope table before localizing cfg (not implemented)")
        pos = jnp.arange(t, dtype=jnp.int32)
        bias = alibi_bias(cfg, pos, pos)[None]

    x = inputs_embeds
    if seq_constrain is not None:
        x = seq_constrain(x)
    new_cache = dict(kv_cache) if kv_cache is not None else None

    def block_fn(layer, x):
        return _block(layer, cfg, x, tp_axis=tp_axis, positions=positions,
                      mask=mask, bias=bias, flash_fn=flash_fn,
                      key_valid=attention_mask)
    if remat:
        block_fn = jax.checkpoint(block_fn,
                                  policy=jax.checkpoint_policies.nothing_saveable)
    for i, layer in enumerate(params["layers"]):
        x, (k_new, v_new) = block_fn(layer, x)
        if seq_constrain is not None:
            x = seq_constrain(x)
        if kv_cache is not None:
            # in-place slice writes (XLA aliases these into the cache buffer —
            # no per-layer full-cache pad/copy)
            if _cache_is_flat(new_cache):
                bb, hkv, tt, dd = k_new.shape
                dt = new_cache["k"].dtype
                flat = lambda z: z.transpose(0, 2, 1, 3).reshape(
                    bb, tt, hkv * dd)
                if "k_scale" in new_cache:
                    # per (token, kv-head) scales on the [B, T, n_kv, D] view;
                    # scale layout is [layers, B, n_kv, T] (init_kv_cache)
                    kt = k_new.transpose(0, 2, 1, 3)
                    vt = v_new.transpose(0, 2, 1, 3)
                    width = new_cache["k"].shape[-1]
                    if width == hkv * dd // 2:          # nibble-packed int4
                        kq, ks = _quant_pack4_flat(kt)  # ks [B, T, n_kv]
                        vq, vs = _quant_pack4_flat(vt)
                    else:
                        kq, ks = _quant_rows(kt, jnp.int8)
                        vq, vs = _quant_rows(vt, jnp.int8)
                        ks, vs = ks[..., 0], vs[..., 0]
                    new_cache["k"] = new_cache["k"].at[i, :, :t, :].set(
                        kq.reshape(bb, tt, width))
                    new_cache["v"] = new_cache["v"].at[i, :, :t, :].set(
                        vq.reshape(bb, tt, width))
                    new_cache["k_scale"] = new_cache["k_scale"].at[
                        i, :, :, :t].set(ks.transpose(0, 2, 1))
                    new_cache["v_scale"] = new_cache["v_scale"].at[
                        i, :, :, :t].set(vs.transpose(0, 2, 1))
                else:
                    new_cache["k"] = new_cache["k"].at[i, :, :t, :].set(
                        flat(k_new).astype(dt))
                    new_cache["v"] = new_cache["v"].at[i, :, :t, :].set(
                        flat(v_new).astype(dt))
            elif "k_scale" in new_cache:
                kq, ks = _quant_rows(k_new, new_cache["k"].dtype)
                vq, vs = _quant_rows(v_new, new_cache["v"].dtype)
                new_cache["k"] = new_cache["k"].at[i, :, :, :t, :].set(kq)
                new_cache["v"] = new_cache["v"].at[i, :, :, :t, :].set(vq)
                new_cache["k_scale"] = new_cache["k_scale"].at[
                    i, :, :, :t].set(ks[..., 0])
                new_cache["v_scale"] = new_cache["v_scale"].at[
                    i, :, :, :t].set(vs[..., 0])
            else:
                dt = new_cache["k"].dtype
                new_cache["k"] = new_cache["k"].at[i, :, :, :t, :].set(
                    k_new.astype(dt))
                new_cache["v"] = new_cache["v"].at[i, :, :, :t, :].set(
                    v_new.astype(dt))
    x = _norm(params["final_norm"], x, cfg)
    return x, new_cache


def forward_pipelined(params: Params, cfg: LLMConfig,
                      inputs_embeds: jnp.ndarray, *,
                      mesh, n_micro: int,
                      attention_mask: Optional[jnp.ndarray] = None,
                      positions: Optional[jnp.ndarray] = None,
                      stacked_layers=None,
                      ) -> jnp.ndarray:
    """Full-sequence forward with the decoder blocks PIPELINED over the
    mesh's "pp" axis (parallel/pipeline.pipeline_blocks: GPipe schedule,
    shard_map + ppermute). Same math as `forward` — tested block-for-block
    against it — with layer weights stacked [n_layers, ...] and sharded
    P("pp") so each stage holds n_layers/pp layers.

    stacked_layers: pre-stacked (and ideally pre-sharded) layer tree from
    parallel.pipeline.stack_layers(params["layers"]); stacked here as a
    convenience when omitted (no memory scaling in that case).
    Embeddings and the final norm run outside the pipelined segment under
    plain GSPMD. Rope models only (an ALiBi bias is not per-row aux).
    Returns final-norm hidden states [B, T, H].
    """
    assert cfg.pos_emb != "alibi", "pipelined forward: rope models only"
    from ..parallel import pipeline as ppl

    b, t, _ = inputs_embeds.shape
    if positions is None:
        if attention_mask is not None:
            positions = jnp.maximum(
                attention_mask.astype(jnp.int32).cumsum(-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    causal = jnp.tril(jnp.ones((t, t), bool))
    mask = jnp.broadcast_to(causal[None, None], (b, 1, t, t))
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :]

    if stacked_layers is None:
        stacked_layers = ppl.stack_layers(params["layers"])

    def block_fn(layer, x, aux):
        y, _ = _block(layer, cfg, x, positions=aux["positions"],
                      mask=aux["mask"], bias=None, flash_fn=None)
        return y

    x = ppl.pipeline_blocks(stacked_layers, inputs_embeds,
                            {"positions": positions, "mask": mask},
                            block_fn, mesh=mesh, n_micro=n_micro)
    return _norm(params["final_norm"], x, cfg)


def decode_chunk(params: Params, cfg: LLMConfig, kv_cache: Params,
                 inputs_embeds: jnp.ndarray, cache_len: jnp.ndarray,
                 tp_axis: Optional[str] = None,
                 ) -> Tuple[jnp.ndarray, Params]:
    """Multi-token decode against the cache: process T proposed tokens in ONE
    pass (weights read once for the whole chunk) — the verification step of
    speculative decoding (runtime/generate.speculative_generate).

    inputs_embeds: [B, T, H]; cache_len: [B] int32 — first write position per
    row (token t lands at cache_len + t). Attention of chunk position t sees
    cache slots [0, cache_len + t]. Returns (hidden [B, T, H], cache).
    Supports rope models on heads-layout caches (fp or int8/int4 quant) AND
    quantized flat caches (int8_flat/int4_flat — the production decode
    format; chunk attention runs the banded Pallas kernel
    ops/flash_attention.decode_attention_q_chunk, which streams each cache
    block ONCE for the whole chunk)."""
    if _cache_is_flat(kv_cache):
        return _decode_chunk_flat(params, cfg, kv_cache, inputs_embeds,
                                  cache_len, tp_axis=tp_axis)
    b, t, _ = inputs_embeds.shape
    l_max = kv_cache["k"].shape[3]
    positions = cache_len[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    if cfg.pos_emb == "alibi":
        raise NotImplementedError("speculative chunk decode: rope models")

    x = inputs_embeds
    out_cache = dict(kv_cache)
    quant = "k_scale" in kv_cache
    batch_idx = jnp.arange(b)[:, None]                       # [B, 1]
    key_pos = jnp.arange(l_max, dtype=jnp.int32)
    # [B, 1(head), T, L]: chunk position t attends cache slots <= cache_len+t
    mask = key_pos[None, None, None, :] <= positions[:, None, :, None]
    for i, layer in enumerate(params["layers"]):
        h_in = _norm(layer["input_norm"], x, cfg)
        qp, kp, vp = _qkv_proj(layer["attn"], h_in, cfg)
        q = split_heads(qp, cfg.num_heads)
        k1 = split_heads(kp, cfg.num_kv_heads)
        v1 = split_heads(vp, cfg.num_kv_heads)
        rot_dim = int(cfg.head_dim * cfg.rope_pct)
        cos, sin = rope_tables(cfg, positions)
        q = apply_rope(q, cos, sin, rot_dim)
        k1 = apply_rope(k1, cos, sin, rot_dim)
        # scatter the chunk's K/V at per-row dynamic positions
        kv_t = lambda z: jnp.swapaxes(z, 1, 2)               # [B, T, n_kv, D]
        if quant:
            kq, ks = _quant_rows(kv_t(k1), out_cache["k"].dtype)
            vq, vs = _quant_rows(kv_t(v1), out_cache["v"].dtype)
            out_cache["k"] = out_cache["k"].at[
                i, batch_idx, :, positions].set(kq)
            out_cache["v"] = out_cache["v"].at[
                i, batch_idx, :, positions].set(vq)
            out_cache["k_scale"] = out_cache["k_scale"].at[
                i, batch_idx, :, positions].set(ks[..., 0])
            out_cache["v_scale"] = out_cache["v_scale"].at[
                i, batch_idx, :, positions].set(vs[..., 0])
        else:
            dt = out_cache["k"].dtype
            out_cache["k"] = out_cache["k"].at[
                i, batch_idx, :, positions].set(kv_t(k1).astype(dt))
            out_cache["v"] = out_cache["v"].at[
                i, batch_idx, :, positions].set(kv_t(v1).astype(dt))
        k_cache, v_cache = _cache_kv(out_cache, i, q.dtype)
        n_rep = cfg.num_heads // cfg.num_kv_heads
        att = mha(q, _repeat_kv(k_cache, n_rep), _repeat_kv(v_cache, n_rep),
                  mask=mask)
        x = x + _psum_tp(nn.linear(layer["attn"]["o"], merge_heads(att),
                                   amax_reduce=_amax_reduce_for(tp_axis)),
                         tp_axis)
        x = x + _psum_tp(_mlp(layer["mlp"], _norm(layer["post_norm"], x, cfg),
                              cfg, tp_axis=tp_axis), tp_axis)
    return _norm(params["final_norm"], x, cfg), out_cache


def _decode_chunk_flat(params: Params, cfg: LLMConfig, kv_cache: Params,
                       inputs_embeds: jnp.ndarray, cache_len: jnp.ndarray,
                       tp_axis: Optional[str] = None,
                       ) -> Tuple[jnp.ndarray, Params]:
    """decode_chunk over the QUANTIZED flat cache (int8 rows or nibble-packed
    int4): quantize + scatter the chunk's K/V at per-row compact slots
    [cache_len, cache_len + T), then one banded-kernel chunk-attention pass
    per layer. The per-row scatter costs once per CHUNK (not per token), so
    it amortizes over accepted speculative runs; the cache blocks stream
    once per chunk at full flat-row bandwidth."""
    assert "k_scale" in kv_cache, \
        "flat chunk decode needs a quantized flat cache (int8_flat/int4_flat)"
    if cfg.pos_emb == "alibi":
        raise NotImplementedError("speculative chunk decode: rope models")
    b, t, _ = inputs_embeds.shape
    kd = kv_cache["k"].shape[-1]
    pack4 = kd == (cfg.num_kv_heads * cfg.head_dim) // 2
    positions = cache_len[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    rot_dim = int(cfg.head_dim * cfg.rope_pct)
    cos, sin = rope_tables(cfg, positions)
    batch_idx = jnp.arange(b)[:, None]
    from ..ops.flash_attention import decode_attention_q_chunk
    x = inputs_embeds
    out_cache = dict(kv_cache)
    for i, layer in enumerate(params["layers"]):
        h_in = _norm(layer["input_norm"], x, cfg)
        qp, kp, vp = _qkv_proj(layer["attn"], h_in, cfg)
        q = split_heads(qp, cfg.num_heads)
        k1 = split_heads(kp, cfg.num_kv_heads)
        v1 = split_heads(vp, cfg.num_kv_heads)
        q = apply_rope(q, cos, sin, rot_dim)
        k1 = apply_rope(k1, cos, sin, rot_dim)
        kt = jnp.swapaxes(k1, 1, 2)                    # [B, T, n_kv, D]
        vt = jnp.swapaxes(v1, 1, 2)
        if pack4:
            kq, ks = _quant_pack4_flat(kt)             # [B,T,kd/2], [B,T,n_kv]
            vq, vs = _quant_pack4_flat(vt)
        else:
            kq, ks = _quant_rows(kt, jnp.int8)
            vq, vs = _quant_rows(vt, jnp.int8)
            kq = kq.reshape(b, t, kd)
            vq = vq.reshape(b, t, kd)
            ks, vs = ks[..., 0], vs[..., 0]
        # per-row scatter ONCE per chunk (out-of-budget slots past the cache
        # end drop silently — those chunk positions are never emitted)
        out_cache["k"] = out_cache["k"].at[i, batch_idx, positions].set(
            kq.astype(out_cache["k"].dtype))
        out_cache["v"] = out_cache["v"].at[i, batch_idx, positions].set(
            vq.astype(out_cache["v"].dtype))
        out_cache["k_scale"] = out_cache["k_scale"].at[
            i, batch_idx, :, positions].set(ks.astype(
                out_cache["k_scale"].dtype))
        out_cache["v_scale"] = out_cache["v_scale"].at[
            i, batch_idx, :, positions].set(vs.astype(
                out_cache["v_scale"].dtype))
        att = decode_attention_q_chunk(
            merge_heads(q), out_cache["k"], out_cache["k_scale"],
            out_cache["v"], out_cache["v_scale"], cache_len,
            n_kv=cfg.num_kv_heads, head_dim=cfg.head_dim, pack4=pack4,
            layer=i)
        x = x + _psum_tp(nn.linear(layer["attn"]["o"], att,
                                   amax_reduce=_amax_reduce_for(tp_axis)),
                         tp_axis)
        x = x + _psum_tp(_mlp(layer["mlp"], _norm(layer["post_norm"], x, cfg),
                              cfg, tp_axis=tp_axis), tp_axis)
    return _norm(params["final_norm"], x, cfg), out_cache


def decode_step(params: Params, cfg: LLMConfig, kv_cache: Params,
                inputs_embeds: jnp.ndarray, cache_len: jnp.ndarray,
                key_mask: jnp.ndarray,
                write_slot: Optional[jnp.ndarray] = None,
                attend_len: Optional[int] = None,
                valid_len: Optional[jnp.ndarray] = None,
                tp_axis: Optional[str] = None,
                ) -> Tuple[jnp.ndarray, Params]:
    """One decode step.

    tp_axis: mesh axis for MANUAL tensor parallelism inside a shard_map
    (parallel/tp.py) — params/cfg/cache are this device's kv-head shard and
    o/down outputs psum over the axis. The one-launch fused layer tail is
    skipped under tp (the psum boundary falls inside its fusion); the
    banded Pallas attention kernels and quantized flat caches stay.

    valid_len: optional TRACED int32 scalar — no cache slot at or beyond it
    is valid this step (flat quantized caches only: the Pallas kernel skips
    whole length blocks past it; see decode_attention_q).

    inputs_embeds: [B, 1, H]; cache_len: [B] int32 — logical position per row
    (drives rope); key_mask: [B, attend_len or L_max] bool — valid cache
    positions *including* this step.
    write_slot: optional SCALAR int32 — when given, every row's K/V lands at
    this same cache slot via one dynamic_update_slice per tensor instead of a
    per-row scatter (XLA scatters with per-row indices measured ~2x the cost
    of the whole int4 MLP stack at 7B). greedy_generate always decodes
    batch-synchronized, so it writes step s at slot prompt_max + s for every
    row and masks the per-row pad gap — per-row scatter remains for
    slot-asynchronous callers (runtime/serving.ContinuousBatcher).
    attend_len: optional STATIC prefix length — attention reads only cache
    slots [0, attend_len) (a zero-copy static slice of the buffer). The
    caller guarantees every valid slot is below it (greedy_generate's
    growing-cache segments). Heads-layout only; writes still target the full
    buffer. Returns (hidden [B, 1, H], updated cache).
    """
    b = inputs_embeds.shape[0]
    positions = cache_len[:, None]
    bias = None
    if cfg.pos_emb == "alibi":
        if tp_axis is not None:
            raise NotImplementedError(
                "manual tp: ALiBi slopes index GLOBAL heads (see forward)")
        l_max = kv_cache["k"].shape[3]
        k_pos = jnp.arange(l_max, dtype=jnp.int32)
        dist = jnp.maximum(positions[:, :, None] - k_pos[None, None, :], 0
                           ).astype(jnp.float32)                   # [B, 1, L]
        bias = -alibi_slopes(cfg.num_heads)[None, :, None, None] \
            * dist[:, None, :, :]                                  # [B, H, 1, L]

    x = inputs_embeds
    out_cache = dict(kv_cache)
    quant = "k_scale" in kv_cache
    flat = _cache_is_flat(kv_cache)
    batch_idx = jnp.arange(b)
    if cfg.pos_emb == "rope":
        # identical for every layer — computed once per step, not per layer
        rot_dim = int(cfg.head_dim * cfg.rope_pct)
        cos, sin = rope_tables(cfg, positions)
    for i, layer in enumerate(params["layers"]):
        def put_heads(buf, val):
            """val [B, n_kv, D] -> cache slot (uniform DUS or scatter)."""
            if write_slot is not None:
                return jax.lax.dynamic_update_slice(
                    buf, val[None, :, :, None].astype(buf.dtype),
                    (i, 0, 0, write_slot, 0))
            return buf.at[i, batch_idx, :, cache_len].set(val.astype(buf.dtype))

        def put_scale(buf, val):
            """val [B, n_kv, 1] -> [layers, B, n_kv, T] scale slot."""
            if write_slot is not None:
                return jax.lax.dynamic_update_slice(
                    buf, val[None].astype(buf.dtype), (i, 0, 0, write_slot))
            return buf.at[i, batch_idx, :, cache_len].set(
                val[..., 0].astype(buf.dtype))

        def put_flat(buf, val):
            """val [B, X] -> flat-layout cache slot."""
            if write_slot is not None:
                return jax.lax.dynamic_update_slice(
                    buf, val[None, :, None].astype(buf.dtype),
                    (i, 0, write_slot, 0))
            return buf.at[i, batch_idx, cache_len].set(val.astype(buf.dtype))

        h_in = _norm(layer["input_norm"], x, cfg)
        # compute this step's k/v, then write into the cache at cache_len
        qp, kp, vp = _qkv_proj(layer["attn"], h_in, cfg)
        q = split_heads(qp, cfg.num_heads)
        k1 = split_heads(kp, cfg.num_kv_heads)
        v1 = split_heads(vp, cfg.num_kv_heads)
        if cfg.pos_emb == "rope":
            q = apply_rope(q, cos, sin, rot_dim)
            k1 = apply_rope(k1, cos, sin, rot_dim)
        if flat:
            dt = out_cache["k"].dtype
            kd = out_cache["k"].shape[-1]
            assert attend_len is None, \
                "attend_len prefix reads are heads-layout only"
            if bias is not None:
                raise NotImplementedError(
                    "flat-cache decode supports rope/no-bias models; "
                    "use the heads-layout cache for ALiBi")
            if quant:
                # quantized flat cache + fused Pallas decode attention:
                # full-rate int8/int4 cache rows, in-VMEM dequant
                # (ops/flash_attention.decode_attention_q)
                pack4 = kd == (cfg.num_kv_heads * cfg.head_dim) // 2
                if pack4:
                    kq, ksc = _quant_pack4_flat(k1[:, :, 0])  # [B, kd], [B, n_kv]
                    vq, vsc = _quant_pack4_flat(v1[:, :, 0])
                else:
                    kq, ksc = _quant_rows(k1[:, :, 0], jnp.int8)
                    vq, vsc = _quant_rows(v1[:, :, 0], jnp.int8)
                    ksc, vsc = ksc[..., 0], vsc[..., 0]

                def put_scale_flat(buf, val):
                    """val [B, n_kv] -> [layers, B, n_kv, L] scale slot."""
                    if write_slot is not None:
                        return jax.lax.dynamic_update_slice(
                            buf, val[None, :, :, None].astype(buf.dtype),
                            (i, 0, 0, write_slot))
                    return buf.at[i, batch_idx, :, cache_len].set(
                        val.astype(buf.dtype))

                out_cache["k"] = put_flat(out_cache["k"], kq.reshape(b, kd))
                out_cache["v"] = put_flat(out_cache["v"], vq.reshape(b, kd))
                out_cache["k_scale"] = put_scale_flat(out_cache["k_scale"],
                                                      ksc)
                out_cache["v_scale"] = put_scale_flat(out_cache["v_scale"],
                                                      vsc)
                from ..ops import fused_layer as fl
                if (fl.FUSED_LAYER and tp_axis is None
                        and fl.layer_tail_supported(layer, cfg)):
                    # ONE pallas launch for attention + o-proj + residual +
                    # RMSNorm + int4 MLP (ops/fused_layer.py) — launch-count
                    # is a first-order decode cost on this platform
                    from ..ops.flash_attention import banded_q8
                    qb8, qs8 = banded_q8(
                        q[:, :, 0].reshape(b, cfg.num_heads * cfg.head_dim),
                        n_kv=cfg.num_kv_heads, head_dim=cfg.head_dim)
                    y = fl.fused_layer_tail(
                        x[:, 0], qb8, qs8,
                        out_cache["k"], out_cache["k_scale"],
                        out_cache["v"], out_cache["v_scale"], key_mask,
                        layer["attn"]["o"], layer["post_norm"]["scale"],
                        layer["mlp"], n_kv=cfg.num_kv_heads,
                        head_dim=cfg.head_dim, pack4=pack4, layer=i,
                        act=cfg.act, norm_eps=cfg.norm_eps,
                        valid_len=valid_len)
                    x = y.astype(x.dtype)[:, None]
                    continue
                from ..ops.flash_attention import decode_attention_q
                att = decode_attention_q(
                    q[:, :, 0].reshape(b, cfg.num_heads * cfg.head_dim),
                    out_cache["k"], out_cache["k_scale"],
                    out_cache["v"], out_cache["v_scale"], key_mask,
                    n_kv=cfg.num_kv_heads, head_dim=cfg.head_dim,
                    pack4=pack4, layer=i, valid_len=valid_len)
                x = x + _psum_tp(
                    nn.linear(layer["attn"]["o"], att[:, None],
                              amax_reduce=_amax_reduce_for(tp_axis)),
                    tp_axis)
                x = x + _psum_tp(_mlp(layer["mlp"],
                                      _norm(layer["post_norm"], x, cfg), cfg,
                                      tp_axis=tp_axis),
                                 tp_axis)
                continue
            # flat fp cache + fused Pallas attention: 4-8 KB cache rows and
            # no head-split relayout of the cache read
            from ..ops.flash_attention import decode_attention
            out_cache["k"] = put_flat(out_cache["k"],
                                      k1[:, :, 0].reshape(b, kd))
            out_cache["v"] = put_flat(out_cache["v"],
                                      v1[:, :, 0].reshape(b, kd))
            att = decode_attention(
                q[:, :, 0].reshape(b, cfg.num_heads * cfg.head_dim),
                out_cache["k"], out_cache["v"], key_mask,
                n_kv=cfg.num_kv_heads, layer=i)
            x = x + _psum_tp(
                nn.linear(layer["attn"]["o"], att[:, None],
                          amax_reduce=_amax_reduce_for(tp_axis)),
                tp_axis)
            x = x + _psum_tp(_mlp(layer["mlp"],
                                  _norm(layer["post_norm"], x, cfg), cfg,
                                  tp_axis=tp_axis),
                             tp_axis)
            continue
        # static prefix view of the cache for the attention reads (the
        # growing-cache segments: slots >= attend_len are provably unwritten)
        al = slice(None) if attend_len is None else slice(0, attend_len)
        if bias is not None and attend_len is not None:
            bias_r = bias[..., :attend_len]
        else:
            bias_r = bias
        if quant:
            kq, ksc = _quant_rows(k1[:, :, 0], out_cache["k"].dtype)
            vq, vsc = _quant_rows(v1[:, :, 0], out_cache["v"].dtype)
            out_cache["k"] = put_heads(out_cache["k"], kq)
            out_cache["v"] = put_heads(out_cache["v"], vq)
            out_cache["k_scale"] = put_scale(out_cache["k_scale"], ksc)
            out_cache["v_scale"] = put_scale(out_cache["v_scale"], vsc)
            # scale-folded attention straight over the int8 cache — no
            # dequantized cache image is ever materialized
            att = _int8_kv_decode_attention(
                q, out_cache["k"][i][:, :, al], out_cache["k_scale"][i][:, :, al],
                out_cache["v"][i][:, :, al], out_cache["v_scale"][i][:, :, al],
                key_mask, bias=bias_r)
        else:
            out_cache["k"] = put_heads(out_cache["k"], k1[:, :, 0])
            out_cache["v"] = put_heads(out_cache["v"], v1[:, :, 0])
            k_cache, v_cache = _cache_kv(out_cache, i, q.dtype,
                                         attend_len=attend_len)
            n_rep = cfg.num_heads // cfg.num_kv_heads
            att = mha(q, _repeat_kv(k_cache, n_rep), _repeat_kv(v_cache, n_rep),
                      mask=key_mask[:, None, None, :], bias=bias_r)
        x = x + _psum_tp(nn.linear(layer["attn"]["o"], merge_heads(att),
                                   amax_reduce=_amax_reduce_for(tp_axis)),
                         tp_axis)
        x = x + _psum_tp(_mlp(layer["mlp"], _norm(layer["post_norm"], x, cfg),
                              cfg, tp_axis=tp_axis), tp_axis)
    x = _norm(params["final_norm"], x, cfg)
    return x, out_cache
