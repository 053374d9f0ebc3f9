"""SAM ViT image encoder, TPU-native.

Functional re-design of the reference encoder
(model/segment_anything/modeling/image_encoder.py:17-125; ViT-H: 32 blocks,
window-14 attention with 4 global blocks at {7,15,23,31}, decomposed rel-pos,
1x1+LN2d+3x3+LN2d neck -> [B, 64, 64, 256]).

TPU choices:
  * NHWC layout end-to-end (XLA's native conv layout; the neck convs and
    LayerNorm2d run as channel-last ops).
  * windows are folded into the batch dimension -> large uniform batched
    matmuls for the MXU instead of per-window loops.
  * rel-pos enters as an additive bias to a shared attention primitive, so
    the same code path runs the reference einsum or a Pallas flash kernel.
  * fp32 softmax/LN statistics under bf16 params.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import SAMEncoderConfig
from ..ops.attention import (decomposed_rel_pos_bias, merge_heads, mha,
                             split_heads, window_partition, window_unpartition)


def init(key, cfg: SAMEncoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth + 4)
    grid = cfg.grid
    params = {
        "patch_embed": nn.conv2d_init(keys[0], 3, cfg.embed_dim,
                                      (cfg.patch_size, cfg.patch_size), dtype=dtype),
        "pos_embed": jnp.zeros((1, grid, grid, cfg.embed_dim), dtype),
        "blocks": [],
        "neck": {
            "conv1": nn.conv2d_init(keys[1], cfg.embed_dim, cfg.out_chans, (1, 1),
                                    bias=False, dtype=dtype),
            "ln1": nn.layer_norm_init(cfg.out_chans, dtype),
            "conv2": nn.conv2d_init(keys[2], cfg.out_chans, cfg.out_chans, (3, 3),
                                    bias=False, dtype=dtype),
            "ln2": nn.layer_norm_init(cfg.out_chans, dtype),
        },
    }
    head_dim = cfg.embed_dim // cfg.num_heads
    for i in range(cfg.depth):
        k = jax.random.split(keys[3 + i], 6)
        is_global = i in cfg.global_attn_indexes
        size = grid if is_global else cfg.window_size
        blk = {
            "ln1": nn.layer_norm_init(cfg.embed_dim, dtype),
            "qkv": nn.linear_init(k[0], cfg.embed_dim, 3 * cfg.embed_dim, dtype=dtype),
            "proj": nn.linear_init(k[1], cfg.embed_dim, cfg.embed_dim, dtype=dtype),
            "ln2": nn.layer_norm_init(cfg.embed_dim, dtype),
            "mlp": nn.mlp_init(k[2], cfg.embed_dim,
                               int(cfg.embed_dim * cfg.mlp_ratio), dtype=dtype),
        }
        if cfg.use_rel_pos:
            blk["rel_pos_h"] = jnp.zeros((2 * size - 1, head_dim), dtype)
            blk["rel_pos_w"] = jnp.zeros((2 * size - 1, head_dim), dtype)
        params["blocks"].append(blk)
    return params


def _rel_projections(q, rel_pos_h, rel_pos_w, h, w):
    """Per-axis rel-pos projections: ([B,Hd,N,kh], [B,Hd,N,kw]) in q's dtype
    (bf16 matmuls accumulate fp32 on the MXU, so the values match the old
    fp32-materialized einsum after its own bf16 downcast — without writing
    the fp32 intermediates to HBM, ~2 GB/global-block at batch 16)."""
    from ..ops.attention import get_rel_pos
    rh = get_rel_pos(h, h, rel_pos_h).astype(q.dtype)
    rw = get_rel_pos(w, w, rel_pos_w).astype(q.dtype)
    b, nh, _, d = q.shape
    r_q = q.reshape(b, nh, h, w, d)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw)
    return rel_h.reshape(b, nh, h * w, h), rel_w.reshape(b, nh, h * w, w)


def _rel_projections_packed(q_flat, rel_pos_h, rel_pos_w, ws, num_heads):
    """Rel-pos projections from the UNSPLIT q ([BW, T, H*D]) into the packed
    layout the fused window kernel consumes: [BW, T, 2*H*ws], lanes
    [h*ws:(h+1)*ws] = rel_h of head h, [(H+h)*ws:...] = rel_w. bf16 matmuls
    with fp32 MXU accumulation — same values as the fp32 einsum path up to
    the (identical) bf16 rounding of the inputs."""
    from ..ops.attention import get_rel_pos
    rh = get_rel_pos(ws, ws, rel_pos_h).astype(q_flat.dtype)    # [ws, ws, D]
    rw = get_rel_pos(ws, ws, rel_pos_w).astype(q_flat.dtype)
    bw, t, c = q_flat.shape
    d = c // num_heads
    r_q = q_flat.reshape(bw, ws, ws, num_heads, d)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", r_q, rh)             # [bw,x,y,H,ws]
    rel_w = jnp.einsum("bxynd,ykd->bxynk", r_q, rw)
    return jnp.concatenate([rel_h.reshape(bw, t, num_heads * ws),
                            rel_w.reshape(bw, t, num_heads * ws)], axis=-1)


def _attention(p, x: jnp.ndarray, num_heads: int, use_rel_pos: bool,
               use_flash: bool, fast: bool = False,
               windowed: bool = False) -> jnp.ndarray:
    """x: [B, H, W, C] (B may include folded windows).

    fast=True keeps the bias/logits tensors in the activation dtype (bf16)
    with fp32 softmax statistics only — halves windowed-attention HBM traffic
    (~13% faster SAM-H encode) at ~7e-2 bf16 feature drift. Off by default;
    production bf16 inference enables it via SAMEncoderConfig/bench."""
    import math
    b, h, w, c = x.shape
    if use_flash and use_rel_pos and windowed:
        # fused whole-window kernel over the PACKED layout: qkv stays unsplit
        # (no split/merge-head HBM transposes), logits/bias live only in VMEM
        from ..ops.flash_attention import sam_window_attention_packed
        qkv = nn.linear(p["qkv"], x.reshape(b, h * w, c))
        rel = _rel_projections_packed(qkv[:, :, :c], p["rel_pos_h"],
                                      p["rel_pos_w"], h, num_heads)
        out = sam_window_attention_packed(qkv, rel, num_heads, c // num_heads, h)
        return nn.linear(p["proj"], out).reshape(b, h, w, c)
    qkv = nn.linear(p["qkv"], x.reshape(b, h * w, c))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, num_heads) for t in (q, k, v))
    if use_flash and use_rel_pos:
        from ..ops.flash_attention import sam_flash_attention
        rel_h, rel_w = _rel_projections(q, p["rel_pos_h"], p["rel_pos_w"], h, w)
        out = sam_flash_attention(q, k, v, rel_h.astype(q.dtype),
                                  rel_w.astype(q.dtype), (h, w))
    elif fast and use_rel_pos:
        from ..ops.attention import get_rel_pos
        rh = get_rel_pos(h, h, p["rel_pos_h"]).astype(q.dtype)
        rw = get_rel_pos(w, w, p["rel_pos_w"]).astype(q.dtype)
        d = q.shape[-1]
        r_q = q.reshape(b, num_heads, h, w, d)
        rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, rh)
        rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, rw)
        bias = (rel_h[..., :, None] + rel_w[..., None, :]
                ).reshape(b, num_heads, h * w, h * w)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q / math.sqrt(d), k) + bias
        m = jax.lax.stop_gradient(logits.max(-1, keepdims=True))
        p_ = jnp.exp((logits - m).astype(jnp.float32)).astype(q.dtype)
        probs = p_ / p_.sum(-1, keepdims=True).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    else:
        bias = None
        if use_rel_pos:
            bias = decomposed_rel_pos_bias(q, p["rel_pos_h"], p["rel_pos_w"],
                                           (h, w), (h, w))
        out = mha(q, k, v, bias=bias)
    out = merge_heads(out)
    return nn.linear(p["proj"], out).reshape(b, h, w, c)


def _block(p, x: jnp.ndarray, cfg: SAMEncoderConfig, window: int,
           use_flash: bool, fast_windowed: bool = False,
           fast_gelu: bool = False) -> jnp.ndarray:
    shortcut = x
    x = nn.layer_norm(p["ln1"], x)
    if window > 0:
        h, w = x.shape[1], x.shape[2]
        x, pad_hw = window_partition(x, window)
        # use_flash: fused multi-window-per-program kernel (no HBM logits);
        # else einsum, optionally with bf16 bias/logits traffic (fast_windowed)
        x = _attention(p, x, cfg.num_heads, cfg.use_rel_pos,
                       use_flash=use_flash, fast=fast_windowed, windowed=True)
        x = window_unpartition(x, window, pad_hw, (h, w))
    else:
        x = _attention(p, x, cfg.num_heads, cfg.use_rel_pos, use_flash=use_flash)
    x = shortcut + x
    act = nn.gelu_tanh if fast_gelu else nn.gelu_exact
    return x + nn.mlp(p["mlp"], nn.layer_norm(p["ln2"], x), act=act)


def _scan_plan(cfg: SAMEncoderConfig):
    """Static run-length plan over the block sequence: [(window, n), ...] —
    maximal runs of consecutive windowed blocks (window=window_size) broken
    by the global-attention blocks (window=0, n=1). ViT-H ({7,15,23,31}
    global) -> [(14,7),(0,1)] x 4."""
    plan = []
    i = 0
    while i < cfg.depth:
        if i in cfg.global_attn_indexes:
            plan.append((0, 1))
            i += 1
        else:
            j = i
            while j < cfg.depth and j not in cfg.global_attn_indexes:
                j += 1
            plan.append((cfg.window_size, j - i))
            i = j
    return plan


def stack_for_scan(params, cfg: SAMEncoderConfig):
    """Re-layout encoder params so apply() runs each windowed-block run as
    ONE lax.scan over stacked weights instead of inlining every block into
    the HLO. All windowed blocks share one compiled body, which cuts the
    XLA compile time of the e2e pipeline (ViT-H inlines 28 windowed-block
    copies otherwise); the math is identical (bit-equal under jit —
    tests/test_sam.py). Opt-in: production callers keep the inlined layout
    by default; bench.py adopts it via BENCH_SAM_SCAN=1. Accepts plain or
    quantized (ops/quant.py) block leaves — any array pytree stacks. The
    stacked layout is single-chip/inference oriented: the megatron sharding
    rules in parallel/sharding.py address per-block paths and do not apply
    to it.
    Returns a new params dict with "blocks" replaced by "block_runs", one
    entry per _scan_plan run (stacked leading axis n for runs, the plain
    block dict for the n=1 globals)."""
    blocks = params["blocks"]
    assert len(blocks) == cfg.depth, (len(blocks), cfg.depth)
    out = {k: v for k, v in params.items() if k != "blocks"}
    runs = []
    i = 0
    for window, n in _scan_plan(cfg):
        group = blocks[i:i + n]
        i += n
        if n == 1:
            runs.append(group[0])
        else:
            runs.append(jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *group))
    out["block_runs"] = runs
    return out


def apply(params, cfg: SAMEncoderConfig, images: jnp.ndarray, *,
          use_flash: bool = False, remat: bool = False,
          fast_windowed: bool = False, fast_gelu: bool = False) -> jnp.ndarray:
    """images: [B, img, img, 3] NHWC (already normalized/padded).
    Returns [B, grid, grid, out_chans] NHWC feature maps. remat=True
    rematerializes each block under grad (memory <-> FLOPs trade)."""
    x = nn.conv2d(params["patch_embed"], images,
                  stride=(cfg.patch_size, cfg.patch_size), padding="VALID")
    x = x + params["pos_embed"].astype(x.dtype)
    block_fn = _block
    if remat:
        block_fn = jax.checkpoint(
            _block, policy=jax.checkpoint_policies.nothing_saveable,
            static_argnums=(2, 3, 4, 5, 6))
    if "block_runs" in params:
        # stacked layout (stack_for_scan): one compiled body per windowed
        # run instead of depth inlined block copies
        plan = _scan_plan(cfg)
        assert len(params["block_runs"]) == len(plan), (
            "stacked params were built under a different cfg "
            f"({len(params['block_runs'])} runs vs plan {plan})")
        for (window, n), run in zip(plan, params["block_runs"]):
            if n > 1:
                lead = jax.tree_util.tree_leaves(run)[0].shape[0]
                assert lead == n, (
                    f"stacked run has leading dim {lead}, plan expects {n}")
            if n == 1:
                x = block_fn(run, x, cfg, window, use_flash, fast_windowed,
                             fast_gelu)
            else:
                def body(h, p, _w=window):
                    return block_fn(p, h, cfg, _w, use_flash, fast_windowed,
                                    fast_gelu), None
                x, _ = jax.lax.scan(body, x, run)
    else:
        for i, blk in enumerate(params["blocks"]):
            window = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = block_fn(blk, x, cfg, window, use_flash, fast_windowed,
                         fast_gelu)
    # neck in fp32 to mirror the reference's overflow guard (image_encoder.py:118-124)
    n = params["neck"]
    y = x.astype(jnp.float32)
    y = nn.conv2d({k: v.astype(jnp.float32) for k, v in n["conv1"].items()}, y,
                  padding="VALID")
    y = nn.layer_norm2d(n["ln1"], y)
    y = nn.conv2d({k: v.astype(jnp.float32) for k, v in n["conv2"].items()}, y,
                  padding="SAME")
    y = nn.layer_norm2d(n["ln2"], y)
    return y.astype(x.dtype)
