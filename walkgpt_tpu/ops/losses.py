"""Training losses.

Numerics match the reference (utils/utils_walkgpt.py):
  * dice_loss (:76-99) — sigmoid + scale-1000 stabilized dice, sum/(num+1e-8)
  * sigmoid_ce_loss (:103-120) — per-mask spatial-mean BCE, sum/(num+1e-8)
  * overlap_loss (:122-160) — per-question BCE weighted on >=2-mask overlap
    regions (defined but unused by the reference drivers; kept for parity)
  * infonce_loss (:8-73 + call site model/walkgpt.py:449-473) — region
    alignment: positives are TinyCrossAttn-pooled (optionally top-k-refined)
    SAM tokens of the own row; negatives are all tokens of *other* rows;
    CE over [pos | negatives] / tau.

TPU note: every loss takes static-shape inputs with an optional validity mask
so the padded training step stays jittable; the unmasked calls are exactly the
reference semantics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.projectors import tiny_xattn_apply


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks: float, *,
              scale: float = 1000.0, eps: float = 1e-6,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """inputs: [N, H, W] logits; targets: [N, H, W] binary."""
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32)).reshape(inputs.shape[0], -1)
    tgt = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    numerator = 2.0 * (probs / scale * tgt).sum(-1)
    denominator = (probs / scale).sum(-1) + (tgt / scale).sum(-1)
    loss = 1.0 - (numerator + eps) / (denominator + eps)
    if valid is not None:
        loss = loss * valid.astype(loss.dtype)
    return loss.sum() / (num_masks + 1e-8)


def sigmoid_ce_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks: float, *,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """inputs: [N, H, W] logits; targets: [N, H, W] binary."""
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # BCE-with-logits, elementwise, numerically stable
    per_elem = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per_mask = per_elem.reshape(x.shape[0], -1).mean(-1)
    if valid is not None:
        per_mask = per_mask * valid.astype(per_mask.dtype)
    return per_mask.sum() / (num_masks + 1e-8)


def overlap_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks: float,
                 batch_seg_token_count: jnp.ndarray) -> jnp.ndarray:
    """Penalize predictions where >=2 masks of the same question overlap."""
    if inputs.shape[0] == 0 or float(num_masks) == 0:
        return jnp.zeros((), jnp.float32)
    counts = jnp.asarray(batch_seg_token_count)
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), counts.cumsum(-1)])
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    n = x.shape[0]
    row_ids = jnp.arange(n)
    # question id per mask row
    qid = jnp.searchsorted(offsets[1:], row_ids, side="right")
    # overlap regions per question: count of positive predictions >= 2
    pos = (x > 0).astype(jnp.int32)
    num_q = offsets.shape[0] - 1
    q_onehot = jax.nn.one_hot(qid, num_q, dtype=jnp.int32)        # [N, Q]
    overlap_per_q = jnp.einsum("nq,nhw->qhw", q_onehot, pos) >= 2  # [Q, H, W]
    weight = overlap_per_q[qid].astype(jnp.float32)                # [N, H, W]
    per_elem = (jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))) * weight
    per_mask = per_elem.reshape(n, -1).mean(-1)
    return per_mask.sum() / (num_masks + 1e-8)


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    return x / n


def infonce_loss(
    pred_embeddings: jnp.ndarray,      # [M, D] [SEG]-token embeddings (CTP output)
    sam_tokens: jnp.ndarray,           # [rows, N, D] row-aligned SAM grid tokens
    seg_row_ids: jnp.ndarray,          # [M] row index per embedding
    tiny_xattn_params,
    *,
    temperature: float = 0.07,
    top_k: Optional[int] = 8,
    exclude_same_row: bool = True,
    valid: Optional[jnp.ndarray] = None,   # [M] bool — False rows are padding
    row_valid: Optional[jnp.ndarray] = None,  # [rows] bool — False rows'
    # tokens are excluded from the negative pool (row-bucketing pads
    # duplicate a real image's tokens; they must not perturb the contrast)
    return_aux: bool = False,
):
    """Region-alignment InfoNCE. With `valid`, padded entries contribute 0 and
    the mean runs over valid entries only (static-shape jittable)."""
    m = pred_embeddings.shape[0]
    rows, n_tok, d = sam_tokens.shape
    if m == 0:
        return (jnp.zeros((), jnp.float32), {}) if return_aux else jnp.zeros((), jnp.float32)

    kv = sam_tokens[seg_row_ids]                           # [M, N, D]
    v_pos, attn_w = tiny_xattn_apply(tiny_xattn_params, pred_embeddings, kv)

    if top_k is not None and 0 < top_k < n_tok:
        vals, idx = jax.lax.top_k(attn_w, top_k)           # [M, K]
        alpha = vals / (vals.sum(-1, keepdims=True) + 1e-12)
        v_top = jnp.take_along_axis(kv, idx[..., None], axis=1)   # [M, K, D]
        v_pos = jnp.einsum("mk,mkd->md", alpha.astype(v_top.dtype), v_top)

    z = _l2norm(pred_embeddings.astype(jnp.float32))
    vp = _l2norm(v_pos.astype(jnp.float32))
    pos = (z * vp).sum(-1, keepdims=True)                   # [M, 1]

    v_all = _l2norm(sam_tokens.astype(jnp.float32).reshape(rows * n_tok, d))
    all_sim = z @ v_all.T                                   # [M, rows*N]

    if exclude_same_row:
        row_of_col = jnp.repeat(jnp.arange(rows), n_tok)     # [rows*N]
        same = seg_row_ids[:, None] == row_of_col[None, :]
        all_sim = jnp.where(same, -jnp.inf, all_sim)
    if row_valid is not None:
        col_ok = jnp.repeat(row_valid.astype(bool), n_tok)   # [rows*N]
        all_sim = jnp.where(col_ok[None, :], all_sim, -jnp.inf)

    logits = jnp.concatenate([pos, all_sim], axis=1) / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -logp[:, 0]                                       # label 0 = positive
    if valid is not None:
        v = valid.astype(jnp.float32)
        loss = (per * v).sum() / jnp.maximum(v.sum(), 1.0)
    else:
        loss = per.mean()
    if return_aux:
        return loss, {"v_pos": v_pos, "attn_w": attn_w, "logits": logits}
    return loss


def cross_entropy_with_smoothing(logits: jnp.ndarray, labels: jnp.ndarray, *,
                                 ignore_index: int = -100,
                                 label_smoothing: float = 0.1) -> jnp.ndarray:
    """Token CE with label smoothing, matching torch F.cross_entropy semantics
    (reference llava_llama.py:111-125 applies it to shifted logits/labels).

    logits: [T, V]; labels: [T]. Mean over non-ignored positions; smoothing
    distributes eps over all V classes (torch formula:
    (1-eps)*nll + eps * mean_k(-logp_k))."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(-1)
    per = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    per = per * valid.astype(per.dtype)
    return per.sum() / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
