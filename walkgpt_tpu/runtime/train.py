"""Training runtime: optimizer, LR schedule, trainability policy, and the
pjit-compiled SPMD train step.

Reference contract (train_walkgpt.py:508-576 + SURVEY §2.6):
  * AdamW (betas 0.9/0.95, no weight decay) + WarmupDecayLR — linear warmup
    over `warmup_num_steps` then linear decay to 0 over `total_num_steps`;
  * gradient clipping at 1.0;
  * trainable set after LoRA wrapping: LoRA(q,v) + lm_head + embed_tokens +
    SAM mask decoder + CTP (text_hidden_fcs) + MSQP/mm projectors
    (train_walkgpt.py:263-359). Everything else frozen — enforced here by an
    optax mask so the compiled graph stays uniform;
  * ZeRO-style sharded optimizer states — expressed as shardings over the
    "dp" mesh axis (parallel/sharding.py), XLA inserts the collectives.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import WalkGPTConfig
from ..models import walkgpt
from ..parallel import sharding as shd


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    warmup_steps: int = 20
    total_steps: int = 270           # 5 epochs x 54 steps (instructions.md:29)
    grad_accum: int = 1
    train_mask_decoder: bool = True
    train_tiny_xattn: bool = False   # reference leaves TinyCrossAttn frozen
    full_finetune: bool = False      # True trains the whole LLM (no LoRA set)
    tune_projector_only: bool = False  # LLaVA stage-1 adapter pretrain
                                       # (train/train.py tune_mm_mlp_adapter)


def warmup_decay_lr(cfg: TrainConfig):
    """DeepSpeed WarmupDecayLR: linear 0->lr over warmup, then linear lr->0."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(cfg.warmup_steps, 1)
        decay = (cfg.total_steps - step) / jnp.maximum(
            cfg.total_steps - cfg.warmup_steps, 1)
        frac = jnp.where(step < cfg.warmup_steps, warm, decay)
        return cfg.lr * jnp.clip(frac, 0.0, 1.0)
    return schedule


def trainable_mask(params: Any, cfg: TrainConfig) -> Any:
    """Bool pytree: True = trained (reference requires_grad policy)."""
    def rule(path_str: str) -> bool:
        if cfg.tune_projector_only:
            return path_str.startswith(("msqp/", "mm_projector"))
        if cfg.full_finetune and path_str.startswith("llm/"):
            return True
        if "lora_a" in path_str or "lora_b" in path_str:
            return True
        if "lora_scale" in path_str:
            return False     # peft scale alpha/r is a constant, never trained
        if path_str.startswith(("llm/embed_tokens", "llm/lm_head")):
            return True
        if path_str.startswith("sam/mask_decoder"):
            return cfg.train_mask_decoder
        if path_str.startswith(("ctp/", "msqp/", "mm_projector")):
            return True
        if path_str.startswith("tiny_xattn"):
            return cfg.train_tiny_xattn
        return False

    return jax.tree_util.tree_map_with_path(
        lambda path, _: rule(shd._path_str(path)), params)


def make_optimizer(cfg: TrainConfig, params: Any):
    mask = trainable_mask(params, cfg)
    inv_mask = jax.tree_util.tree_map(lambda m: not m, mask)
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(learning_rate=warmup_decay_lr(cfg), b1=cfg.beta1,
                    b2=cfg.beta2, weight_decay=cfg.weight_decay),
    )
    # masked() passes raw grads through for masked-out leaves — explicitly
    # zero the frozen updates (and keep no optimizer state for them).
    opt = optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv_mask),
    )
    if cfg.grad_accum > 1:
        # DeepSpeed grad_accumulation_steps equivalent: updates apply every
        # grad_accum micro-batches, averaged.
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt, mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(params: Any, cfg: TrainConfig) -> Tuple[TrainState, Any]:
    opt, mask = make_optimizer(cfg, params)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32)), opt


def loss_fn(params, model_cfg: WalkGPTConfig, batch: Dict, max_segs: int,
            seq_constrain=None, remat: bool = False):
    out = walkgpt.model_forward(
        params, model_cfg,
        images=batch["images"], input_ids=batch["input_ids"],
        labels=batch["labels"], attention_mask=batch["attention_mask"],
        row_image_idx=batch["row_image_idx"], gt_masks=batch["gt_masks"],
        pixel_hw=batch["pixel_hw"], max_segs=max_segs,
        seq_constrain=seq_constrain, remat=remat)
    metrics = {"loss": out.loss, "ce_loss": out.ce_loss,
               "mask_bce_loss": out.mask_bce_loss,
               "mask_dice_loss": out.mask_dice_loss,
               "nce_loss": out.nce_loss, "mask_loss": out.mask_loss}
    return out.loss, metrics


def train_step(state: TrainState, batch: Dict, *, opt,
               model_cfg: WalkGPTConfig, max_segs: int, seq_constrain=None,
               remat: bool = False) -> Tuple[TrainState, Dict]:
    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, model_cfg, batch, max_segs,
                               seq_constrain, remat)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), metrics


# ---------------------------------------------------------------------------
# QLoRA: partitioned gradients over a frozen (possibly integer-quantized) base
# ---------------------------------------------------------------------------
#
# train_step differentiates the FULL param tree: correct, but it materializes
# a same-size gradient tree (13 GB of bf16 grads at 13B) and breaks outright
# on integer leaves (jax.grad rejects int8/packed-int4 inputs). The reference
# recipe only ever trains LoRA(q,v) + embed/lm_head + mask decoder +
# projectors (train_walkgpt.py:263-359) — so we split the tree by that policy
# and differentiate ONLY the trainable subtree; the frozen base (which may be
# ops/quant int8 / ops/int4 packed-int4) rides along as a plain argument that
# XLA never builds cotangents for. This is what lets the 13B recipe train on
# one 16 GB v5e chip: quantized frozen base + full-precision adapters, the
# TPU-native equivalent of QLoRA's nf4-base + bf16-LoRA split.

def _is_none(x) -> bool:
    return x is None


def partition_params(params: Any, mask: Any) -> Tuple[Any, Any]:
    """Split a param tree into (trainable, frozen) by a bool mask tree.
    Both outputs keep the FULL tree structure with None at the other
    partition's leaves, so they re-zip leafwise in combine_params."""
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine_params(trainable: Any, frozen: Any) -> Any:
    """Inverse of partition_params: at every leaf exactly one side is None."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t, trainable, frozen,
        is_leaf=_is_none)


def init_qlora_state(params: Any, cfg: TrainConfig
                     ) -> Tuple[TrainState, Any, Any]:
    """Partition by the trainable policy and build the optimizer over ONLY
    the trainable subtree. Returns (state, opt, frozen): state.params is the
    trainable subtree; pass `frozen` to every qlora_train_step call (and to
    combine_params for eval/export).

    Validates the split: a trainable integer leaf means the quantizer ate a
    trained weight (e.g. quantize_llm without quantize_lm_head=False), and a
    frozen `a8` projection would run its activation through round() during
    training — a zero-gradient wall for every adapter beneath it. Both are
    config bugs; fail fast with the fix spelled out."""
    mask = trainable_mask(params, cfg)
    bad = []

    def _chk(path, leaf, m):
        if m and hasattr(leaf, "dtype") and not jnp.issubdtype(
                leaf.dtype, jnp.inexact):
            bad.append(shd._path_str(path))

    jax.tree_util.tree_map_with_path(_chk, params, mask)
    if bad:
        raise ValueError(
            f"trainable leaves with integer dtype {bad[:4]}: keep trained "
            "groups dense (quantize_llm(..., quantize_lm_head=False), no "
            "quantize_embeddings) or freeze them")
    flags = []
    jax.tree_util.tree_map_with_path(
        lambda path, leaf: flags.append(shd._path_str(path))
        if shd._path_str(path).endswith("/a8") else None, params)
    if flags:
        raise ValueError(
            f"W8A8 activation quantization present ({flags[0]} ...): its "
            "per-token round() has zero gradient — quantize the training "
            "base with act_quant=False (weight-only int8 / packed int4)")

    trainable, frozen = partition_params(params, mask)
    opt, _ = make_optimizer(cfg, trainable)
    state = TrainState(params=trainable, opt_state=opt.init(trainable),
                       step=jnp.zeros((), jnp.int32))
    return state, opt, frozen


def qlora_train_step(state: TrainState, frozen: Any, batch: Dict, *, opt,
                     model_cfg: WalkGPTConfig, max_segs: int,
                     seq_constrain=None, remat: bool = False
                     ) -> Tuple[TrainState, Dict]:
    """train_step over the trainable subtree only; `frozen` is a plain
    argument (never differentiated, never copied into optimizer state)."""
    def lf(tp):
        return loss_fn(combine_params(tp, frozen), model_cfg, batch,
                       max_segs, seq_constrain, remat)

    (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt, state.step + 1), metrics


def batch_pspecs(batch: Dict) -> Dict:
    """Shard rows/images over dp; replicate the rest."""
    specs = {}
    for k, v in batch.items():
        if k in ("images", "input_ids", "labels", "attention_mask",
                 "row_image_idx"):
            specs[k] = P("dp", *([None] * (v.ndim - 1)))
        else:
            specs[k] = P()
    return specs


def make_sharded_train_step(mesh: Mesh, opt, model_cfg: WalkGPTConfig,
                            max_segs: int, state: TrainState, batch: Dict,
                            *, sp: bool = False, remat: bool = False):
    """jit the train step with explicit in/out shardings over the mesh.

    Note on dp batch sharding: model_forward gathers [SEG]s globally, so with
    dp>1 the per-step seg gather runs on the full (all-gathered) row set —
    XLA handles the collectives; images/LLM forward stay dp-sharded.
    sp=True adds sequence-parallel residual-stream constraints over the tp
    axis (parallel/sharding.seq_constrainer) — same math, reduce-scatter/
    all-gather boundary collectives and 1/tp activation residency.
    Returns (step_fn, sharded_state, sharded_batch_specs)."""
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    p_specs = shd.param_pspecs(state.params, tp=tp)
    try:
        opt_specs = optax.tree_utils.tree_map_params(
            opt, lambda _, spec: spec, state.opt_state, p_specs,
            transform_non_params=lambda _: P())
        opt_specs = jax.tree_util.tree_map(
            lambda spec, leaf: shd.zero_spec(spec, leaf.shape, dp)
            if hasattr(leaf, "shape") else P(),
            opt_specs, state.opt_state)
    except Exception:
        opt_specs = shd.opt_state_pspecs(state.opt_state, p_specs,
                                         state.params, dp=dp)
    def named(tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), tree,
            is_leaf=lambda x: isinstance(x, P))

    state_shardings = TrainState(params=named(p_specs),
                                 opt_state=named(opt_specs),
                                 step=NamedSharding(mesh, P()))
    b_shardings = named(batch_pspecs(batch))

    sharded_state = TrainState(
        params=shd.shard_tree(state.params, mesh, p_specs),
        opt_state=shd.shard_tree(state.opt_state, mesh, opt_specs),
        step=jax.device_put(state.step, NamedSharding(mesh, P())))

    seq_constrain = shd.seq_constrainer(mesh) if (sp and tp > 1) else None

    def _step(st, bt):
        return train_step(st, bt, opt=opt, model_cfg=model_cfg,
                          max_segs=max_segs, seq_constrain=seq_constrain,
                          remat=remat)

    step_fn = jax.jit(
        _step,
        in_shardings=(state_shardings, b_shardings),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
    )
    return step_fn, sharded_state, b_shardings
