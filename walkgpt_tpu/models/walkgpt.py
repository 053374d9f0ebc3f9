"""WalkGPT model composition, TPU-native.

The full grounded-navigation pipeline as pure functions over one param tree:

    SAM ViT-H encode (1024²) ─┬─> MSQP -> 6x6 tokens -> bilinear 16x16=256
                              │        -> splice at <image> -> LLaMA decode
                              │        -> [SEG] hidden states -> CTP
                              └────────────────────────> SAM mask decoder -> masks

Behavioral contract follows model/walkgpt.py `model_forward` (:267-605) and
`evaluate` (:607-746), with these deliberate choices (SURVEY §8):
  * the mask decoder always consumes genuine SAM encoder features
    ([B,64,64,256]) — the self-consistent `evaluate()` semantics (WART-1);
  * the NCE weight is the effective hardcoded 0.2 (WART-2), exposed in config;
  * visual-token bookkeeping: 36 MSQP tokens -> 16x16=256 spliced tokens, net
    +255 sequence growth per <image>, [SEG] timeline mask built by
    front-padding 255 zeros (model/walkgpt.py:295-306).

TPU design: everything in the training step is static-shape jittable —
[SEG] gathering uses jnp.nonzero(size=max_segs) with validity flags, and mask
losses run on a fixed 1024² canvas with per-image pixel-validity masks, which
is numerically identical to the reference's crop+resize-to-label pipeline
because label size == SAM-resized size in the train path.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.config import WalkGPTConfig
from ..ops.losses import (cross_entropy_with_smoothing, dice_loss,
                          infonce_loss, sigmoid_ce_loss)
from ..ops.resize import bilinear_resize
from ..runtime.generate import GenerateResult, greedy_generate
from . import clip_vit, llm, sam
from .projectors import (ctp_apply, ctp_init, msqp_apply, msqp_init,
                         tiny_xattn_init)

IMAGE_TOKEN_INDEX = -200
IGNORE_INDEX = -100


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def sam_config(cfg: WalkGPTConfig) -> sam.SamConfig:
    return sam.SamConfig(encoder=cfg.sam, prompt=cfg.prompt_encoder,
                         decoder=cfg.mask_decoder)


def init(key, cfg: WalkGPTConfig, dtype=jnp.float32, *, llm_init=None) -> Dict:
    llm_init = llm_init or llm.init
    keys = jax.random.split(key, 7)
    params = {
        "llm": llm_init(keys[0], cfg.llm, dtype),
        "sam": sam.init(keys[1], sam_config(cfg), dtype),
        "msqp": msqp_init(keys[2], cfg.msqp, cfg.llm.hidden_size, dtype),
        "ctp": [ctp_init(keys[3], cfg.ctp, cfg.llm.hidden_size, dtype)],
        "tiny_xattn": tiny_xattn_init(keys[4], cfg.msqp.sam_dim, dtype),
    }
    if cfg.clip is not None:
        params["clip"] = clip_vit.init(keys[5], cfg.clip, dtype)
        # CLIP->LLM mm projector retained from the LLaVA layer (llava_arch.py:30-88)
        params["mm_projector"] = nn.linear_init(keys[6], cfg.clip.hidden_size,
                                                cfg.llm.hidden_size, dtype=dtype)
    return params


def init_quantized(key, cfg: WalkGPTConfig, dtype=jnp.bfloat16,
                   act_quant: bool = False, sam_int8: bool = False,
                   mlp_int4: bool = False, attn_int4: bool = False,
                   attn_int4_proj: bool = False,
                   head_int4: bool = False,
                   quantize_lm_head: bool = True) -> Dict:
    """Same layout/keys as init(), but the LLM is built int8-quantized
    incrementally on the default device — a 7B/13B model fits a 16 GB chip
    without the full bf16 tree (or a multi-GB host->device transfer) ever
    existing. act_quant=True marks projections for W8A8 dynamic-activation
    int8 (native MXU int8 dot). sam_int8=True additionally quantizes the SAM
    encoder block projections (~0.6 GB HBM freed at ViT-H — headroom the
    single-chip 7B/13B configs spend on decode batch). mlp_int4=True packs
    the LLM MLPs as nibble-packed int4 for the one-launch fused decode
    kernel (ops/int4.py) — halves the decode loop's dominant weight reads
    AND frees ~2/4 GB HBM at 7B/13B for more decode batch."""
    import functools
    from ..ops.quant import quantize_sam_encoder, quantized_llm_init
    params = init(key, cfg, dtype,
                  llm_init=functools.partial(quantized_llm_init,
                                             act_quant=act_quant,
                                             mlp_int4=mlp_int4,
                                             attn_int4=attn_int4,
                                             attn_int4_proj=attn_int4_proj,
                                             head_int4=head_int4,
                                             quantize_lm_head=quantize_lm_head))
    if sam_int8:
        params["sam"] = quantize_sam_encoder(params["sam"],
                                             act_quant=act_quant)
    return params


# ---------------------------------------------------------------------------
# vision encoding
# ---------------------------------------------------------------------------

def encode_sam(params, cfg: WalkGPTConfig, images: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images [B, S, S, 3] -> (feature maps [B, g, g, C], tokens [B, g*g, C]).

    sam_encode_chunk > 0 runs the encoder over sub-batches via lax.map —
    bounds encoder activation memory at large decode batches (the ViT-H
    activations at batch 32 would otherwise crowd the KV cache out of HBM);
    throughput is unchanged (each chunk still saturates the MXU)."""
    def enc(im):
        return sam.encode_image(params["sam"], sam_config(cfg), im,
                                use_flash=cfg.use_flash_attention,
                                fast_windowed=cfg.fast_windowed_attention,
                                fast_gelu=cfg.fast_gelu)
    b = images.shape[0]
    ch = cfg.sam_encode_chunk
    if ch and b > ch and b % ch == 0:
        feats = jax.lax.map(enc, images.reshape(b // ch, ch, *images.shape[1:]))
        feats = feats.reshape(b, *feats.shape[2:])
    else:
        feats = enc(images)
    _, g1, g2, c = feats.shape
    return feats, feats.reshape(b, g1 * g2, c)


def visual_tokens(params, cfg: WalkGPTConfig, sam_tokens: jnp.ndarray) -> jnp.ndarray:
    """SAM grid tokens [B, L, C] -> spliceable LLM tokens [B, 256, H]:
    MSQP to a 6x6 grid, then bilinear to 16x16 (llava_arch.py:251-259)."""
    vis = msqp_apply(params["msqp"], cfg.msqp, sam_tokens)   # [B, s*s, H]
    s = cfg.msqp.target_square_side
    t = cfg.visual_grid
    b, _, h = vis.shape
    grid = vis.reshape(b, s, s, h)
    grid = bilinear_resize(grid, (t, t))
    return grid.reshape(b, t * t, h)


# ---------------------------------------------------------------------------
# <image> splicing (prepare_inputs_labels_for_multimodal equivalent)
# ---------------------------------------------------------------------------

class Spliced(NamedTuple):
    embeds: jnp.ndarray          # [R, T-1+V, H]
    attention_mask: jnp.ndarray  # [R, T-1+V] bool
    labels: Optional[jnp.ndarray]
    image_pos: jnp.ndarray       # [R] index of the <image> sentinel (or T)


def splice_visual(params, cfg: WalkGPTConfig, input_ids: jnp.ndarray,
                  vis_tokens: jnp.ndarray,
                  attention_mask: Optional[jnp.ndarray] = None,
                  labels: Optional[jnp.ndarray] = None,
                  vis_mask: Optional[jnp.ndarray] = None) -> Spliced:
    """Vectorized, static-shape replacement for the reference's per-row python
    splice (llava_arch.py:213-518). Each row's single IMAGE_TOKEN_INDEX
    sentinel is replaced by `visual_tokens` embeddings (+V-1 net growth).
    Rows without a sentinel get the visual block appended after their last
    real token with attention masked off (text-only VQA rows).
    vis_mask [R, V] (optional): per-visual-token validity — the CLIP pixel
    path's 16x16 padding mask (vit_attention_mask_for_llm,
    llava_arch.py:176-181) masking padded patch positions out of attention."""
    r, t = input_ids.shape
    v = cfg.visual_tokens
    out_len = t - 1 + v
    if attention_mask is None:
        attention_mask = jnp.ones((r, t), bool)

    has_img = (input_ids == IMAGE_TOKEN_INDEX).any(axis=1)
    # rows without a sentinel anchor the (masked-off) block at their first pad
    # slot so no real token is displaced out of the timeline
    pos = jnp.where(has_img,
                    jnp.argmax(input_ids == IMAGE_TOKEN_INDEX, axis=1),
                    jnp.minimum(attention_mask.astype(jnp.int32).sum(-1),
                                t - 1))                              # [R]

    safe_ids = jnp.where(input_ids < 0, 0, input_ids)
    tok_embeds = llm.embed(params["llm"], safe_ids)           # [R, T, H]

    j = jnp.arange(out_len)[None]                              # [1, out]
    p = pos[:, None]
    before = j < p
    inside = (j >= p) & (j < p + v)
    # token source index: j for before, j-(v-1) for after
    tok_idx = jnp.where(before, j, j - (v - 1))
    tok_idx = jnp.clip(tok_idx, 0, t - 1)
    vis_idx = jnp.clip(j - p, 0, v - 1)

    gathered_tok = jnp.take_along_axis(
        tok_embeds, tok_idx[..., None], axis=1)
    gathered_vis = jnp.take_along_axis(
        vis_tokens.astype(gathered_tok.dtype), vis_idx[..., None], axis=1)
    embeds = jnp.where(inside[..., None], gathered_vis, gathered_tok)

    attn_tok = jnp.take_along_axis(attention_mask, tok_idx, axis=1)
    # visual block attended only when the row really has an image
    vis_ok = has_img[:, None]
    if vis_mask is not None:
        vis_ok = vis_ok & jnp.take_along_axis(vis_mask, vis_idx, axis=1)
    attn = jnp.where(inside, vis_ok, attn_tok)

    labels_out = None
    if labels is not None:
        lab_tok = jnp.take_along_axis(labels, tok_idx, axis=1)
        labels_out = jnp.where(inside, IGNORE_INDEX, lab_tok)

    return Spliced(embeds=embeds, attention_mask=attn, labels=labels_out,
                   image_pos=pos)


def _splice_block(embeds: jnp.ndarray, sentinels: jnp.ndarray,
                  attn: jnp.ndarray, labels: Optional[jnp.ndarray],
                  vis: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray, Optional[jnp.ndarray],
                                             jnp.ndarray]:
    """Expand the FIRST sentinel of each row of an embedding timeline with the
    visual block `vis` [R, V, H]. `sentinels` is a bool [R, T] map; rows with
    no sentinel get a masked block appended after their last real token.
    Returns (embeds', sentinels', attn', labels', image_pos)."""
    r, t, h = embeds.shape
    v = vis.shape[1]
    out_len = t - 1 + v
    has_img = sentinels.any(axis=1)
    pos = jnp.where(has_img, jnp.argmax(sentinels, axis=1),
                    jnp.minimum(attn.astype(jnp.int32).sum(-1), t - 1))
    j = jnp.arange(out_len)[None]
    p = pos[:, None]
    before = j < p
    inside = (j >= p) & (j < p + v)
    tok_idx = jnp.clip(jnp.where(before, j, j - (v - 1)), 0, t - 1)
    vis_idx = jnp.clip(j - p, 0, v - 1)
    g_tok = jnp.take_along_axis(embeds, tok_idx[..., None], axis=1)
    g_vis = jnp.take_along_axis(vis.astype(g_tok.dtype), vis_idx[..., None],
                                axis=1)
    embeds2 = jnp.where(inside[..., None], g_vis, g_tok)
    attn2 = jnp.where(inside, has_img[:, None],
                      jnp.take_along_axis(attn, tok_idx, axis=1))
    sent2 = jnp.where(inside, False,
                      jnp.take_along_axis(sentinels, tok_idx, axis=1))
    labels2 = None
    if labels is not None:
        labels2 = jnp.where(inside, IGNORE_INDEX,
                            jnp.take_along_axis(labels, tok_idx, axis=1))
    return embeds2, sent2, attn2, labels2, pos


def splice_visual_multi(params, cfg: WalkGPTConfig, input_ids: jnp.ndarray,
                        vis_tokens: jnp.ndarray,
                        attention_mask: Optional[jnp.ndarray] = None,
                        labels: Optional[jnp.ndarray] = None) -> Spliced:
    """Multiple <image> sentinels per row (llava_arch.py's while-loop over
    image_token_indices, :291-389): sentinel k is expanded with image k's
    visual block, left to right. vis_tokens: [R, max_images, V, H]; rows with
    fewer sentinels get masked-off blocks appended (uniform lengths)."""
    r, t = input_ids.shape
    max_images = vis_tokens.shape[1]
    if attention_mask is None:
        attention_mask = jnp.ones((r, t), bool)
    safe_ids = jnp.where(input_ids < 0, 0, input_ids)
    embeds = llm.embed(params["llm"], safe_ids)
    sentinels = input_ids == IMAGE_TOKEN_INDEX
    attn = attention_mask
    lab = labels
    first_pos = None
    for k in range(max_images):
        embeds, sentinels, attn, lab, pos = _splice_block(
            embeds, sentinels, attn, lab, vis_tokens[:, k])
        if first_pos is None:
            first_pos = pos
    return Spliced(embeds=embeds, attention_mask=attn, labels=lab,
                   image_pos=first_pos)


def seg_timeline_mask(input_ids: jnp.ndarray, seg_token_id, cfg: WalkGPTConfig
                      ) -> jnp.ndarray:
    """[SEG] mask on the spliced timeline (model/walkgpt.py:287-306): mask over
    input_ids[:, 1:], one zero appended, V-1 zeros prepended. Indexing hidden
    states with this mask yields, per [SEG], the state at position-1 — the
    state that predicted the [SEG] token."""
    r, t = input_ids.shape
    pad = cfg.visual_tokens - 1
    if isinstance(seg_token_id, (list, tuple)):
        m = jnp.zeros_like(input_ids[:, 1:], bool)
        for sid in seg_token_id:
            m = m | (input_ids[:, 1:] == sid)
    else:
        m = input_ids[:, 1:] == seg_token_id
    m = jnp.concatenate([m, jnp.zeros((r, 1), bool)], axis=1)
    return jnp.concatenate([jnp.zeros((r, pad), bool), m], axis=1)


# ---------------------------------------------------------------------------
# training / teacher-forced forward
# ---------------------------------------------------------------------------

class ForwardOutput(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    mask_bce_loss: jnp.ndarray
    mask_dice_loss: jnp.ndarray
    nce_loss: jnp.ndarray
    mask_loss: jnp.ndarray
    pred_masks: jnp.ndarray       # [max_segs, S, S] logits on the 1024 canvas
    seg_valid: jnp.ndarray        # [max_segs]
    seg_rows: jnp.ndarray         # [max_segs] conversation row per seg
    mask_scores: jnp.ndarray      # [max_segs]


def model_forward(params, cfg: WalkGPTConfig, *,
                  images: jnp.ndarray,            # [B, S, S, 3]
                  input_ids: jnp.ndarray,         # [R, T] (with -200 sentinels)
                  labels: jnp.ndarray,            # [R, T]
                  attention_mask: jnp.ndarray,    # [R, T] bool
                  row_image_idx: jnp.ndarray,     # [R] image index per row
                  gt_masks: jnp.ndarray,          # [max_segs, S, S] canvas
                  pixel_hw: jnp.ndarray,          # [B, 2] valid (h, w) per image
                  max_segs: int,
                  flash_fn=None,
                  seq_constrain=None,
                  remat: bool = False,
                  ) -> ForwardOutput:
    """Fully jittable teacher-forced forward + losses.

    seq_constrain: optional residual-stream sharding constraint for
    sequence-parallel training (parallel/sharding.seq_constrainer),
    threaded into llm.forward.
    remat=True rematerializes LLM blocks on the backward pass — the TPU
    equivalent of the reference's gradient_checkpointing_enable
    (train_walkgpt.py:245); required to fit 13B QLoRA training activations
    on one 16 GB chip."""
    if flash_fn is None and cfg.use_flash_attention:
        from ..ops.flash_attention import flash_attention
        flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True,
                                                       key_valid=kv)
    b = images.shape[0]
    r, t = input_ids.shape
    v = cfg.visual_tokens
    lw = cfg.losses

    # 1. SAM encode once per image, expand per conversation row
    feats, sam_tokens = encode_sam(params, cfg, images)
    vis_all = visual_tokens(params, cfg, sam_tokens)          # [B, 256, H]
    vis_rows = vis_all[row_image_idx]                          # [R, 256, H]
    sam_tokens_rows = sam_tokens[row_image_idx]                # [R, L, C]

    # 2. splice + LLM forward
    sp = splice_visual(params, cfg, input_ids, vis_rows,
                       attention_mask=attention_mask, labels=labels)
    hidden, _ = llm.forward(params["llm"], cfg.llm, sp.embeds,
                            attention_mask=sp.attention_mask, flash_fn=flash_fn,
                            seq_constrain=seq_constrain, remat=remat)
    logits = llm.lm_logits(params["llm"], cfg.llm, hidden)

    # 3. token CE (shifted, label-smoothed — llava_llama.py:111-125)
    shift_logits = logits[:, :-1].reshape(-1, logits.shape[-1])
    shift_labels = sp.labels[:, 1:].reshape(-1)
    ce = cross_entropy_with_smoothing(shift_logits, shift_labels,
                                      ignore_index=IGNORE_INDEX,
                                      label_smoothing=lw.label_smoothing)

    # 4. [SEG] gather on the spliced timeline
    seg_mask = seg_timeline_mask(input_ids, cfg.seg_token_id, cfg)
    flat = seg_mask.reshape(-1)
    (seg_idx,) = jnp.nonzero(flat, size=max_segs, fill_value=0)
    seg_valid = jnp.arange(max_segs) < flat.sum()
    out_len = seg_mask.shape[1]
    seg_rows = seg_idx // out_len

    hidden_flat = hidden.reshape(r * out_len, -1)
    seg_hidden = hidden_flat[seg_idx]                          # [max_segs, H]
    pred_embeddings = ctp_apply(params["ctp"][0], seg_hidden)  # [max_segs, C]

    # 5. InfoNCE region alignment (single-row batches skip same-row exclusion,
    #    model/walkgpt.py:453-455). Rows with no image sentinel, no [SEG],
    #    and no unmasked label are row-bucketing pads (runtime/batching.py
    #    row_multiple) whose visual tokens duplicate a real image's — keep
    #    them out of the negative pool so padding is loss-inert. Real rows
    #    (incl. text-only VQA, which always carries labels) are unaffected.
    row_nce_ok = ((input_ids == IMAGE_TOKEN_INDEX).any(axis=1)
                  | (input_ids == cfg.seg_token_id).any(axis=1)
                  | ((labels != IGNORE_INDEX).any(axis=1) if labels is not None
                     else jnp.ones((r,), bool)))
    nce = infonce_loss(pred_embeddings, sam_tokens_rows, seg_rows,
                       params["tiny_xattn"], temperature=lw.nce_tau,
                       top_k=lw.nce_topk, exclude_same_row=(r > 1),
                       valid=seg_valid, row_valid=row_nce_ok)

    # 6. SAM mask decoding per [SEG] against its own image's features
    img_of_seg = row_image_idx[seg_rows]
    low_res, _ = sam.decode_masks(params["sam"], sam_config(cfg),
                                  feats[img_of_seg],
                                  text_embeds=pred_embeddings[:, None],
                                  multimask_output=False)      # [M, 1, 4g, 4g]
    img_size = cfg.sam.img_size
    pred_canvas = bilinear_resize(low_res[:, 0][..., None],
                                  (img_size, img_size))[..., 0]  # [M, S, S]

    # 7. mask losses on the canvas, restricted to each image's valid region
    hw = pixel_hw[img_of_seg]                                  # [M, 2]
    yy = jnp.arange(img_size)[None, :, None]
    xx = jnp.arange(img_size)[None, None, :]
    pixel_valid = (yy < hw[:, 0, None, None]) & (xx < hw[:, 1, None, None])

    num_masks = jnp.maximum(seg_valid.sum().astype(jnp.float32), 0.0)
    bce = _masked_bce(pred_canvas, gt_masks, pixel_valid, seg_valid, num_masks)
    dice = _masked_dice(pred_canvas, gt_masks, pixel_valid, seg_valid, num_masks,
                        scale=lw.dice_scale)

    ce_loss = lw.ce * ce
    bce_loss = lw.bce * bce
    dice_loss_ = lw.dice * dice
    nce_loss = lw.nce * nce
    mask_loss = bce_loss + dice_loss_
    total = ce_loss + mask_loss + nce_loss

    score = _mask_score(pred_canvas, pixel_valid)
    return ForwardOutput(loss=total, ce_loss=ce_loss, mask_bce_loss=bce_loss,
                         mask_dice_loss=dice_loss_, nce_loss=nce_loss,
                         mask_loss=mask_loss, pred_masks=pred_canvas,
                         seg_valid=seg_valid, seg_rows=seg_rows,
                         mask_scores=score)


def _masked_bce(pred, gt, pixel_valid, seg_valid, num_masks):
    x = pred.astype(jnp.float32)
    tgt = gt.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0) - x * tgt + jnp.log1p(jnp.exp(-jnp.abs(x)))
    pv = pixel_valid.astype(jnp.float32)
    per_mask = (per_elem * pv).reshape(x.shape[0], -1).sum(-1) \
        / jnp.maximum(pv.reshape(x.shape[0], -1).sum(-1), 1.0)
    per_mask = per_mask * seg_valid.astype(jnp.float32)
    return per_mask.sum() / (num_masks + 1e-8)


def _masked_dice(pred, gt, pixel_valid, seg_valid, num_masks, *, scale=1000.0,
                 eps=1e-6):
    pv = pixel_valid.astype(jnp.float32)
    p = jax.nn.sigmoid(pred.astype(jnp.float32)) * pv
    tgt = gt.astype(jnp.float32) * pv
    p = p.reshape(p.shape[0], -1)
    tgt = tgt.reshape(tgt.shape[0], -1)
    numerator = 2.0 * (p / scale * tgt).sum(-1)
    denominator = (p / scale).sum(-1) + (tgt / scale).sum(-1)
    loss = (1.0 - (numerator + eps) / (denominator + eps)) \
        * seg_valid.astype(jnp.float32)
    return loss.sum() / (num_masks + 1e-8)


def _mask_score(pred_canvas, pixel_valid):
    """mean sigmoid over the predicted-positive region (model/walkgpt.py:742)."""
    pos = (pred_canvas > 0) & pixel_valid
    s = jax.nn.sigmoid(pred_canvas.astype(jnp.float32)) * pos
    return s.reshape(s.shape[0], -1).sum(-1) \
        / (pos.reshape(pos.shape[0], -1).sum(-1) + 1e-6)


# ---------------------------------------------------------------------------
# generation / evaluation path
# ---------------------------------------------------------------------------

class EvaluateOutput(NamedTuple):
    tokens: jnp.ndarray          # [R, max_new]
    lengths: jnp.ndarray         # [R]
    pred_masks: jnp.ndarray      # [max_segs, S, S] canvas logits
    seg_valid: jnp.ndarray       # [max_segs]
    seg_rows: jnp.ndarray        # [max_segs]
    mask_scores: jnp.ndarray     # [max_segs]


class SegEmbeds(NamedTuple):
    """Decode/teacher-forced output UP TO the CTP projection — everything
    except the SAM mask decode. The split exists for the manual-tp path
    (parallel/tp.py): the [max_segs, 256] embeddings are cheap to carry out
    of a shard_map and compact globally; the mask decode then runs ONCE on
    the compacted set (decode_seg_masks), instead of per tp-replica with
    dp x max_segs canvas transients."""
    tokens: jnp.ndarray          # [R, max_new] ([R, T] echo on teacher path)
    lengths: jnp.ndarray         # [R]
    seg_valid: jnp.ndarray       # [max_segs]
    seg_rows: jnp.ndarray        # [max_segs]
    pred_embeddings: jnp.ndarray  # [max_segs, C] CTP outputs


def decode_seg_masks(params, cfg: WalkGPTConfig, feats: jnp.ndarray,
                     pred_embeddings: jnp.ndarray, img_of_seg: jnp.ndarray,
                     pixel_hw: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SAM mask decode tail shared by generate_and_segment / model_forward's
    eval consumers: per [SEG] embedding, decode against its image's genuine
    SAM features (WART-1 / model/walkgpt.py:713-743), upsample to the SAM
    canvas, and score (mean sigmoid over the predicted-positive valid
    region, :742). Returns (canvas logits [M, S, S], scores [M]).

    Runs in cfg.mask_decode_chunk-sized lax.map slices — decoding all segs
    at once co-materializes [M, 64, 64, 256] feature gathers + 1024^2
    upsamples that pushed big programs past XLA's remat threshold (see the
    generate_and_segment note)."""
    img_size = cfg.sam.img_size
    m = pred_embeddings.shape[0]

    def seg_chunk(emb, img_idx):
        low_res, _ = sam.decode_masks(params["sam"], sam_config(cfg),
                                      feats[img_idx],
                                      text_embeds=emb[:, None],
                                      multimask_output=False)
        canvas = bilinear_resize(low_res[:, 0][..., None],
                                 (img_size, img_size))[..., 0]
        hw = pixel_hw[img_idx]
        yy = jnp.arange(img_size)[None, :, None]
        xx = jnp.arange(img_size)[None, None, :]
        pixel_valid = (yy < hw[:, 0, None, None]) & (xx < hw[:, 1, None, None])
        return canvas, _mask_score(canvas, pixel_valid)

    chunk = cfg.mask_decode_chunk
    if chunk and m > chunk and m % chunk == 0:
        n = m // chunk
        pred_canvas, score = jax.lax.map(
            lambda args: seg_chunk(*args),
            (pred_embeddings.reshape(n, chunk, -1),
             img_of_seg.reshape(n, chunk)))
        return (pred_canvas.reshape(m, img_size, img_size),
                score.reshape(m))
    return seg_chunk(pred_embeddings, img_of_seg)


def generate_and_segment(params, cfg: WalkGPTConfig, *,
                         images: jnp.ndarray,          # [B, S, S, 3]
                         input_ids: jnp.ndarray,       # [R, T] prompts
                         attention_mask: jnp.ndarray,  # [R, T]
                         row_image_idx: jnp.ndarray,   # [R]
                         pixel_hw: jnp.ndarray,        # [B, 2]
                         max_new_tokens: int,
                         max_segs: int,
                         eos_id: int,
                         flash_fn=None,
                         images_clip: Optional[jnp.ndarray] = None,
                         clip_resize_hw: Optional[jnp.ndarray] = None,
                         visual_stream: str = "sam",
                         speculative_k: int = 0,
                         cache_constrain=None,
                         precomputed_sam=None,
                         tp_axis: Optional[str] = None,
                         ) -> EvaluateOutput:
    """The `evaluate` pipeline (model/walkgpt.py:607-746), one compiled graph:
    greedy decode from visual tokens, extract [SEG] predictor hidden states,
    CTP-project, decode masks against the SAM features.

    visual_stream selects WART-4's two generation-time streams:
      "sam"  — SAM-MSQP tokens (generate_predictions_from_questions,
               evaluation_walkgpt.py:535-577; the PAVE validate route);
      "clip" — CLIP-448 pixels through the tower + mm_projector
               (evaluate()'s images_clip path, model/walkgpt.py:629-637).
    Either way the MASK decode uses the genuine SAM features from `images`
    (get_visual_embs, model/walkgpt.py:713-743).

    precomputed_sam: optional (feats, sam_tokens) from encode_sam — lets a
    caller split the pipeline into an encode program and this decode+mask
    program (benchmarks/overlap_e2e.py A/B).
    tp_axis: manual tensor-parallel axis when called INSIDE a shard_map
    (parallel/tp.make_tp_generate): cfg.llm and params["llm"] are this
    device's head/intermediate shards; the LLM psums at the megatron
    boundaries while the vision/projector/mask modules run replicated."""
    if flash_fn is None and cfg.use_flash_attention:
        from ..ops.flash_attention import flash_attention
        flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True,
                                                       key_valid=kv)
    if precomputed_sam is not None:
        feats, sam_tokens = precomputed_sam
    else:
        feats, sam_tokens = encode_sam(params, cfg, images)
    vis_mask_rows = None
    if visual_stream == "clip":
        assert images_clip is not None, "clip stream needs images_clip"
        clip_toks, llm_mask = clip_visual_tokens(params, cfg, images_clip,
                                                 clip_resize_hw)
        vis_rows = clip_toks[row_image_idx]
        if llm_mask is not None:
            vis_mask_rows = llm_mask[row_image_idx]
    else:
        assert visual_stream == "sam", visual_stream
        vis_rows = visual_tokens(params, cfg, sam_tokens)[row_image_idx]
    sp = splice_visual(params, cfg, input_ids, vis_rows,
                       attention_mask=attention_mask,
                       vis_mask=vis_mask_rows)
    if speculative_k > 0:
        # prompt-lookup speculative decode: token-identical to greedy, one
        # weight read per verified chunk (PAVE's templated answers give long
        # accepted runs). History = the textual prompt ids (visual sentinel
        # and pad positions excluded).
        from ..runtime.generate import speculative_generate
        hist_ids = jnp.where(attention_mask & (input_ids >= 0),
                             input_ids, -2)
        res: GenerateResult = speculative_generate(
            params["llm"], cfg.llm, sp.embeds, sp.attention_mask,
            max_new_tokens=max_new_tokens, eos_id=eos_id, flash_fn=flash_fn,
            kv_quant=cfg.kv_quant_cache, draft_k=speculative_k,
            prompt_ids=hist_ids, prefill_chunk=cfg.prefill_chunk,
            cache_constrain=cache_constrain, tp_axis=tp_axis)
    else:
        res = greedy_generate(
            params["llm"], cfg.llm, sp.embeds, sp.attention_mask,
            max_new_tokens=max_new_tokens, eos_id=eos_id, flash_fn=flash_fn,
            kv_quant=cfg.kv_quant_cache, prefill_chunk=cfg.prefill_chunk,
            cache_grow_step=cfg.decode_cache_grow,
            scan_segment=cfg.decode_scan_segment,
            cache_constrain=cache_constrain, tp_axis=tp_axis)

    # [SEG] over generated tokens; pred_hidden[t] predicted tokens[t], matching
    # the reference's position-1 indexing (model/walkgpt.py:653-671)
    seg_valid, seg_rows, pred_embeddings = _seg_gather(
        params, cfg, res.tokens, res.pred_hidden, max_segs)

    # mask-decode tail in lax.map chunks: decoding all max_segs at once
    # co-materializes ~3-4 GB of feature-gather + 1024^2 upsample temps that
    # pushed the 7B/512-token program past XLA's remat threshold (the remat
    # then lands in the DECODE LOOP, compressing the KV cache every step:
    # 57 ms/step vs 14; v5e, 2026-08-18) — see decode_seg_masks.
    pred_canvas, score = decode_seg_masks(params, cfg, feats,
                                          pred_embeddings,
                                          row_image_idx[seg_rows], pixel_hw)

    return EvaluateOutput(tokens=res.tokens, lengths=res.lengths,
                          pred_masks=pred_canvas, seg_valid=seg_valid,
                          seg_rows=seg_rows, mask_scores=score)


def _seg_gather(params, cfg: WalkGPTConfig, tokens: jnp.ndarray,
                pred_hidden: jnp.ndarray, max_segs: int):
    """[SEG] positions over a generated-token timeline -> (seg_valid,
    seg_rows, CTP embeddings [max_segs, C])."""
    if isinstance(cfg.seg_token_id, (list, tuple)):
        seg_mask = jnp.zeros_like(tokens, bool)
        for sid in cfg.seg_token_id:
            seg_mask = seg_mask | (tokens == sid)
    else:
        seg_mask = tokens == cfg.seg_token_id
    flat = seg_mask.reshape(-1)
    (seg_idx,) = jnp.nonzero(flat, size=max_segs, fill_value=0)
    seg_valid = jnp.arange(max_segs) < flat.sum()
    seg_rows = seg_idx // tokens.shape[1]
    hid = pred_hidden.reshape(-1, pred_hidden.shape[-1])[seg_idx]
    return seg_valid, seg_rows, ctp_apply(params["ctp"][0], hid)


def generate_seg_embeds(params, cfg: WalkGPTConfig, *,
                        sam_tokens: jnp.ndarray,
                        input_ids: jnp.ndarray,
                        attention_mask: jnp.ndarray,
                        row_image_idx: jnp.ndarray,
                        max_new_tokens: int, max_segs: int, eos_id: int,
                        flash_fn=None, speculative_k: int = 0,
                        tp_axis: Optional[str] = None) -> SegEmbeds:
    """generate_and_segment WITHOUT the mask-decode tail: SAM-stream visual
    tokens -> splice -> greedy/speculative decode -> [SEG] gather -> CTP.
    The manual-tp path (parallel/tp.py) runs this inside a shard_map and
    mask-decodes the globally compacted embeddings outside."""
    if flash_fn is None and cfg.use_flash_attention:
        from ..ops.flash_attention import flash_attention
        flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True,
                                                       key_valid=kv)
    vis_rows = visual_tokens(params, cfg, sam_tokens)[row_image_idx]
    sp = splice_visual(params, cfg, input_ids, vis_rows,
                       attention_mask=attention_mask)
    if speculative_k > 0:
        from ..runtime.generate import speculative_generate
        hist_ids = jnp.where(attention_mask & (input_ids >= 0),
                             input_ids, -2)
        res = speculative_generate(
            params["llm"], cfg.llm, sp.embeds, sp.attention_mask,
            max_new_tokens=max_new_tokens, eos_id=eos_id, flash_fn=flash_fn,
            kv_quant=cfg.kv_quant_cache, draft_k=speculative_k,
            prompt_ids=hist_ids, prefill_chunk=cfg.prefill_chunk,
            tp_axis=tp_axis)
    else:
        res = greedy_generate(
            params["llm"], cfg.llm, sp.embeds, sp.attention_mask,
            max_new_tokens=max_new_tokens, eos_id=eos_id, flash_fn=flash_fn,
            kv_quant=cfg.kv_quant_cache, prefill_chunk=cfg.prefill_chunk,
            cache_grow_step=cfg.decode_cache_grow,
            scan_segment=cfg.decode_scan_segment, tp_axis=tp_axis)
    seg_valid, seg_rows, emb = _seg_gather(params, cfg, res.tokens,
                                           res.pred_hidden, max_segs)
    return SegEmbeds(tokens=res.tokens, lengths=res.lengths,
                     seg_valid=seg_valid, seg_rows=seg_rows,
                     pred_embeddings=emb)


def teacher_seg_embeds(params, cfg: WalkGPTConfig, *,
                       sam_tokens: jnp.ndarray,
                       input_ids: jnp.ndarray,
                       attention_mask: jnp.ndarray,
                       row_image_idx: jnp.ndarray,
                       max_segs: int,
                       flash_fn=None,
                       tp_axis: Optional[str] = None) -> SegEmbeds:
    """Teacher-forced [SEG] embeddings (model_forward's inference=True core,
    model/walkgpt.py:267-447, minus losses): GT conversation rows forward
    once, [SEG] predictor states via the spliced-timeline mask, CTP. The
    sharded-eval fwd pass runs this per shard and mask-decodes outside."""
    if flash_fn is None and cfg.use_flash_attention:
        from ..ops.flash_attention import flash_attention
        flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True,
                                                       key_valid=kv)
    vis_rows = visual_tokens(params, cfg, sam_tokens)[row_image_idx]
    sp = splice_visual(params, cfg, input_ids, vis_rows,
                       attention_mask=attention_mask)
    hidden, _ = llm.forward(params["llm"], cfg.llm, sp.embeds,
                            attention_mask=sp.attention_mask,
                            flash_fn=flash_fn, tp_axis=tp_axis)
    seg_mask = seg_timeline_mask(input_ids, cfg.seg_token_id, cfg)
    flat = seg_mask.reshape(-1)
    (seg_idx,) = jnp.nonzero(flat, size=max_segs, fill_value=0)
    seg_valid = jnp.arange(max_segs) < flat.sum()
    out_len = seg_mask.shape[1]
    seg_rows = seg_idx // out_len
    hid = hidden.reshape(-1, hidden.shape[-1])[seg_idx]
    emb = ctp_apply(params["ctp"][0], hid)
    lengths = attention_mask.astype(jnp.int32).sum(-1)
    return SegEmbeds(tokens=input_ids, lengths=lengths, seg_valid=seg_valid,
                     seg_rows=seg_rows, pred_embeddings=emb)


def finalize_masks(pred_canvas: jnp.ndarray, input_hw: Tuple[int, int],
                   original_hw: Tuple[int, int]) -> jnp.ndarray:
    """Host-side final resize: crop the valid region of the 1024 canvas and
    bilinearly resize to the original image size (sam.py:166-184 tail)."""
    x = pred_canvas[:, :input_hw[0], :input_hw[1]][..., None]
    return bilinear_resize(x, tuple(original_hw))[..., 0]


# ---------------------------------------------------------------------------
# CLIP-stream encoding (capability parity with evaluate()'s images_clip path,
# WART-4) — pixels -> CLIP tower -> mm_projector -> [B, P, H] tokens
# ---------------------------------------------------------------------------

def clip_padding_masks(cfg: WalkGPTConfig, clip_resize_hw: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padding masks for the padded-CLIP pixel path (llava_arch.py:160-193):
    clip_resize_hw [B, 2] valid (h, w) per image ->
      (token mask [B, 1+P] over [class]+patch tokens,
       LLM-side mask [B, visual_tokens] nearest-downsampled to the 16x16 grid).
    """
    assert cfg.clip is not None
    p = cfg.clip.patch_size
    g = cfg.clip.grid
    b = clip_resize_hw.shape[0]
    # patch grid validity: a patch row/col is valid when its nearest source
    # pixel (torch F.interpolate nearest on the pixel mask) is inside (h, w).
    # nearest with floor indexing: patch i samples pixel floor(i * p + ...)
    idx = jnp.floor(jnp.arange(g) * (cfg.clip.image_size / g)).astype(jnp.int32)
    rows = idx[None, :] < clip_resize_hw[:, 0, None]
    cols = idx[None, :] < clip_resize_hw[:, 1, None]
    patch_valid = (rows[:, :, None] & cols[:, None, :])           # [B, g, g]
    cls = jnp.ones((b, 1), bool)
    token_mask = jnp.concatenate([cls, patch_valid.reshape(b, g * g)], axis=1)
    # LLM-side 16x16 mask: nearest-downsample the patch grid
    t = cfg.visual_grid
    tr = jnp.floor(jnp.arange(t) * (g / t)).astype(jnp.int32)
    llm_mask = patch_valid[:, tr[:, None], tr[None, :]].reshape(b, t * t)
    return token_mask, llm_mask


def encode_clip_tokens(params, cfg: WalkGPTConfig, images_clip: jnp.ndarray, *,
                       attention_mask: Optional[jnp.ndarray] = None,
                       clip_resize_hw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CLIP pixel path (encode_images mode b). When clip_resize_hw is given,
    padding masks are derived from it (the reference's vit_attention_mask).

    Note the mm_projector: the reference's current code returns the RAW tower
    features (the projector application at llava_arch.py:118-122 is commented
    out), which cannot splice into an H_llm timeline — the as-written CLIP
    generation stream would crash on the torch.cat. We implement the intended
    transform (tower -> mm_projector -> H_llm), consistent with WART-5
    behave-as-intended policy."""
    assert cfg.clip is not None and "clip" in params, "CLIP tower not built"
    if attention_mask is None and clip_resize_hw is not None:
        attention_mask, _ = clip_padding_masks(cfg, clip_resize_hw)
    hs = clip_vit.apply(params["clip"], cfg.clip, images_clip,
                        attention_mask=attention_mask)
    feats, _aux = clip_vit.select_features(hs, cfg.clip)
    return nn.linear(params["mm_projector"], feats)


def clip_visual_tokens(params, cfg: WalkGPTConfig, images_clip: jnp.ndarray,
                       clip_resize_hw: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """CLIP pixels -> spliceable LLM tokens: tower(+padding mask) ->
    mm_projector -> bilinear downsample of the patch grid to the 16x16
    visual grid (llava_arch.py:251-259), plus the LLM-side validity mask
    (vit_attention_mask_for_llm, :176-181).

    Returns (tokens [B, visual_tokens, H], llm_mask [B, visual_tokens] bool
    or None when no resize list given)."""
    toks = encode_clip_tokens(params, cfg, images_clip,
                              clip_resize_hw=clip_resize_hw)
    b, l, h = toks.shape
    g = int(round(l ** 0.5))
    assert g * g == l, f"CLIP token count {l} is not square"
    t = cfg.visual_grid
    grid = bilinear_resize(toks.reshape(b, g, g, h), (t, t))
    llm_mask = None
    if clip_resize_hw is not None:
        _, llm_mask = clip_padding_masks(cfg, clip_resize_hw)
    return grid.reshape(b, t * t, h), llm_mask
