"""Sharded (dp x tp) INFERENCE over a device mesh — BASELINE config 5.

The reference distributes evaluation with NCCL process groups and a
DistributedSampler (evaluation_walkgpt.py:125-141,393-401) — pure data
parallelism with the full model replicated per GPU. The TPU-native design
goes further: ONE jitted `generate_and_segment` program runs over a
jax.sharding.Mesh with

  * dp — images/conversation rows sharded on their batch axes; each device
    decodes its own rows (the DistributedSampler equivalent, but inside one
    XLA program with no process groups);
  * tp — megatron-sharded towers (parallel/sharding.param_pspecs: SAM ViT
    qkv/mlp, LLM attention/MLP column+row parallel, vocab-sharded
    embedding/lm_head) so a 13B model that cannot fit one chip decodes
    across a v5e-8 slice; XLA inserts the all-reduces over ICI;
  * the decode KV cache sharded over dp (batch) and tp (kv heads)
    (sharding.kv_cache_pspecs), pinned via the cache_constrain hook threaded
    into runtime/generate.greedy_generate — per-device decode cache traffic
    scales 1/(dp*tp).

Two entry points:

  make_sharded_generate — GSPMD path: jit with in_shardings over the mesh.
    Runs any dp x tp; with tp > 1 the compute uses the XLA attention path
    (`mesh_config` below) because the single-chip Pallas kernels are custom
    calls without a GSPMD partitioning rule on TPU. Token-identical to
    single-device greedy (argmax over fp32 logits; tested).

  make_dp_generate — shard_map path: full single-chip program (Pallas flash
    kernels, flat int4/int8 quantized caches, fused decode layers) replicated
    per device over a dp-only mesh; each device runs its local batch shard at
    single-chip speed. This is the production streaming-eval shape (weights
    fit one chip; throughput scales with devices).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import sharding as shd


def mesh_config(cfg, *, tp: int):
    """Config adjustments for GSPMD mesh inference. tp > 1 moves attention
    off the Pallas kernels (XLA einsum path partitions under GSPMD; the
    Mosaic custom calls do not) and flat-layout caches to the heads layout
    (the flat layouts exist for those kernels). tp == 1 keeps everything.
    On the CPU backend (tests / dryrun) Pallas runs in interpret mode and
    lowers to partitionable XLA ops, so the flat layouts stay available
    there — exercised by tests/test_infer_sharded.py."""
    if tp <= 1 or jax.default_backend() == "cpu":
        return cfg
    kv = cfg.kv_quant_cache
    if isinstance(kv, str) and kv.endswith("_flat"):
        kv = kv[:4]                      # int8_flat -> int8 heads layout
    return cfg.replace(use_flash_attention=False, kv_quant_cache=kv)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh under param_pspecs (tp from the
    mesh). Replicated leaves land as fully-replicated arrays."""
    tp = mesh.shape.get("tp", 1)
    specs = shd.param_pspecs(params, tp=tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def make_sharded_generate(mesh: Mesh, cfg, *, max_new_tokens: int,
                          max_segs: int, eos_id: int,
                          visual_stream: str = "sam",
                          speculative_k: int = 0,
                          params_like=None):
    """Jitted generate_and_segment over the mesh (GSPMD).

    Returns fn(params, images, input_ids, attention_mask, row_image_idx,
    pixel_hw[, images_clip, clip_resize_hw]) -> EvaluateOutput with
      params    : param_pspecs over tp (pass a tree placed by shard_params —
                  or any tree; in_shardings re-places it),
      images    : P('dp', ...)   [B, S, S, 3]
      input_ids : P('dp', ...)   [R, T]   (B and R must divide dp)
      outputs   : replicated (tokens/masks are harvested on host).

    row_image_idx values are GLOBAL image indices; GSPMD inserts the gather
    collectives when a row's image lives on another dp shard.
    params_like: a concrete or abstract param tree used to derive the
    in_shardings structure (defaults to deriving at call time via
    tree_map — pass it when jitting ahead of time)."""
    cfg = mesh_config(cfg, tp=mesh.shape.get("tp", 1))
    constrain = shd.cache_constrainer(mesh)

    def gen(params, images, input_ids, attention_mask, row_image_idx,
            pixel_hw, images_clip=None, clip_resize_hw=None):
        from ..models import walkgpt
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            pixel_hw=pixel_hw, max_new_tokens=max_new_tokens,
            max_segs=max_segs, eos_id=eos_id,
            images_clip=images_clip, clip_resize_hw=clip_resize_hw,
            visual_stream=visual_stream, speculative_k=speculative_k,
            cache_constrain=constrain)

    tp = mesh.shape.get("tp", 1)
    dp_sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def param_sh(tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), shd.param_pspecs(tree, tp=tp))

    if params_like is not None:
        p_sh = param_sh(params_like)
        in_sh = (p_sh, dp_sh, dp_sh, dp_sh, dp_sh, dp_sh)
        return jax.jit(gen, in_shardings=in_sh, out_shardings=rep)

    # derive param shardings lazily from the first call's tree
    jitted = {}

    def wrapper(params, *args, **kw):
        if "fn" not in jitted:
            in_sh = (param_sh(params), dp_sh, dp_sh, dp_sh, dp_sh, dp_sh)
            jitted["fn"] = jax.jit(gen, in_shardings=in_sh, out_shardings=rep)
        return jitted["fn"](params, *args, **kw)
    return wrapper


def make_dp_generate(mesh: Mesh, cfg, *, max_new_tokens: int, max_segs: int,
                     eos_id: int, visual_stream: str = "sam",
                     speculative_k: int = 0,
                     shard_seg_budget: str = "split"):
    """shard_map data-parallel generate: the COMPLETE single-chip program
    (Pallas kernels, flat quantized caches) runs per device on its local
    batch shard; params replicate. Requires:
      * a ("dp",)-only mesh (tp inside shard_map would need manual
        collectives in the kernels — make_tp_generate in parallel/tp.py
        provides that path),
      * one conversation row per image (row_image_idx == arange(B) — the
        bench/serving layout; asserted host-side), B % dp == 0,
        max_segs % dp == 0.

    shard_seg_budget:
      "split" (default) — each shard extracts max_segs/dp [SEG]s. NOT always
        equivalent to the single-device global budget: a shard whose rows
        hold more than max_segs/dp [SEG]s drops the excess even though other
        shards have spare budget. Fine for workloads with a per-row seg
        bound <= max_segs/(dp*rows_per_shard) (the bench/serving layouts).
      "full" — every shard extracts up to max_segs, then a global row-major
        compaction keeps the first max_segs valid entries: EXACTLY the
        single-device semantics for any seg distribution, at the cost of a
        transient dp x max_segs canvas buffer.
    Outputs concatenate to the global layout with seg_rows re-offset to
    global row indices."""
    assert tuple(mesh.axis_names) == ("dp",), mesh.axis_names
    assert shard_seg_budget in ("split", "full"), shard_seg_budget
    dp = mesh.shape["dp"]
    assert max_segs % dp == 0, (max_segs, dp)
    local_segs = max_segs if shard_seg_budget == "full" else max_segs // dp
    try:
        from jax import shard_map
        # v0.8+ API: vma checking must be off — the Pallas kernels inside
        # the local program produce ShapeDtypeStructs without vma
        smap_kw = {"check_vma": False}
    except ImportError:                     # older jax
        from jax.experimental.shard_map import shard_map
        smap_kw = {"check_rep": False}

    def local(params, images, input_ids, attention_mask, pixel_hw):
        from ..models import walkgpt
        b = images.shape[0]
        out = walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask,
            row_image_idx=jnp.arange(b, dtype=jnp.int32),
            pixel_hw=pixel_hw, max_new_tokens=max_new_tokens,
            max_segs=local_segs, eos_id=eos_id,
            visual_stream=visual_stream, speculative_k=speculative_k)
        # globalize seg_rows: local row j on shard i is global row i*b + j
        idx = jax.lax.axis_index("dp")
        seg_rows = jnp.where(out.seg_valid, out.seg_rows + idx * b, 0)
        return out._replace(seg_rows=seg_rows)

    smapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=_evaluate_out_specs(mesh), **smap_kw)

    def wrapper(params, images, input_ids, attention_mask, pixel_hw):
        out = smapped(params, images, input_ids, attention_mask, pixel_hw)
        if shard_seg_budget == "full":
            # global row-major compaction to the first max_segs valid segs
            # (shard-local seg order is row-major and shards concatenate in
            # row order, so concat order == single-device global order)
            (sel,) = jnp.nonzero(out.seg_valid, size=max_segs, fill_value=0)
            n_valid = jnp.minimum(out.seg_valid.sum(), max_segs)
            keep = jnp.arange(max_segs) < n_valid
            out = out._replace(
                pred_masks=out.pred_masks[sel],
                seg_valid=keep,
                seg_rows=jnp.where(keep, out.seg_rows[sel], 0),
                mask_scores=jnp.where(keep, out.mask_scores[sel], 0.0))
        return out

    jitted = jax.jit(wrapper)

    def checked(params, images, input_ids, attention_mask, row_image_idx,
                pixel_hw):
        # host-side contract check: the dp program substitutes a local
        # arange, which is only correct for the one-row-per-image layout
        import numpy as np
        rii = np.asarray(row_image_idx)
        assert np.array_equal(rii, np.arange(rii.shape[0])), \
            "make_dp_generate requires row_image_idx == arange(B) " \
            "(one conversation row per image); use make_sharded_generate " \
            "for multi-row-per-image layouts"
        return jitted(params, images, input_ids, attention_mask, pixel_hw)
    return checked


def _evaluate_out_specs(mesh: Mesh):
    """EvaluateOutput field specs for the dp shard_map: every per-row /
    per-seg leading axis concatenates across shards."""
    from ..models.walkgpt import EvaluateOutput
    return EvaluateOutput(tokens=P("dp"), lengths=P("dp"),
                          pred_masks=P("dp"), seg_valid=P("dp"),
                          seg_rows=P("dp"), mask_scores=P("dp"))
