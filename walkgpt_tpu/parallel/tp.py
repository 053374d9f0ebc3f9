"""Manual tensor-parallel INFERENCE over a dp x tp mesh — shard_map running
the PRODUCTION single-chip kernels under tp > 1.

Why this exists: the GSPMD path (parallel/infer.make_sharded_generate) is
correct at any dp x tp but downgrades tp > 1 to the XLA attention path and
heads-layout caches, because the Mosaic custom calls (the banded quantized
decode-attention kernel, the fused int4/int8 MLP kernels, the packed-int4
matmul) carry no GSPMD partitioning rule — XLA would otherwise replicate
their operands. Here the WHOLE generate_and_segment runs as a shard_map
local program per device, so every Pallas kernel executes on ordinary local
arrays exactly as on one chip:

  * kv heads shard over "tp": the flat cache [layers, B, L, n_kv*D] splits
    on its last axis (head-major lanes), scales [layers, B, n_kv, L] on
    n_kv; each device's banded decode kernel runs with n_kv/tp heads —
    per-device decode cache traffic scales 1/(dp*tp) with the SAME kernel;
  * weights shard megatron-style INCLUDING the packed quantized formats:
    repack_llm_tp re-lays qkv4/qkv8 fused projections and the tile-local
    int4 down packing so an even slice along the tp axis IS each device's
    valid local pack (bit-exact — integer codes are re-packed, scales kept);
  * the residual stream stays replicated; llm._psum_tp reduces the o- and
    down-projection partial sums over "tp" (2 psums/layer, the megatron
    inference schedule), so greedy argmax is bit-identical across the tp
    group;
  * SAM encode shards over BOTH axes (each of the dp*tp devices encodes
    B/(dp*tp) images), then one all_gather over "tp" hands each tp group
    its dp shard's features — encode scales with the full slice while
    decode runs tp-sharded. MSQP/CTP/mask-decoder replicate within a tp
    group (tiny next to the towers).

Behavioral contract: BASELINE config 5 ("13B sharded towers, streaming PAVE
eval", matching /root/reference/evaluation_walkgpt.py:125-141) with the
reference's pure-DP process groups replaced by one XLA program over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LLMConfig

Params = Dict


# ---------------------------------------------------------------------------
# local config
# ---------------------------------------------------------------------------

def tp_llm_cfg(cfg: LLMConfig, tp: int) -> LLMConfig:
    """The LOCAL LLM config a tp-shard device runs: head counts and the
    (init-only) intermediate size divide by tp; hidden/vocab stay global
    (residual stream and lm_head are replicated). head_dim is pinned to its
    GLOBAL value — the local hidden//num_heads quotient would be tp x off."""
    if tp == 1:
        return cfg
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0, (cfg.intermediate_size, tp)
    assert cfg.pos_emb != "alibi", \
        "manual tp: ALiBi slopes index global heads (llm.forward guard)"
    return dataclasses.replace(cfg,
                               num_heads=cfg.num_heads // tp,
                               num_kv_heads=cfg.num_kv_heads // tp,
                               intermediate_size=cfg.intermediate_size // tp,
                               head_dim_value=cfg.head_dim)


# ---------------------------------------------------------------------------
# weight repacking: global trees whose even tp-axis slices are valid local
# packs for every production format
# ---------------------------------------------------------------------------

def _col_slices(w, tp: int, axis: int):
    n = w.shape[axis]
    assert n % tp == 0, (w.shape, axis, tp)
    return jnp.split(w, tp, axis=axis)


def _permute_qkv_cols(arr, cfg: LLMConfig, tp: int, axis: int):
    """Reorder a fused-qkv output axis [q | k | v] into
    [q_0 k_0 v_0 | q_1 k_1 v_1 | ...] so slice r along `axis` is shard r's
    own fused [q_r | k_r | v_r] pack. Query heads are kv-major ordered
    (head h reads kv head h // n_rep, llm._int8_kv_decode_attention), so a
    contiguous head-block slice keeps GQA groups intact."""
    hq = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    q, k, v = (jax.lax.slice_in_dim(arr, 0, hq, axis=axis),
               jax.lax.slice_in_dim(arr, hq, hq + kvd, axis=axis),
               jax.lax.slice_in_dim(arr, hq + kvd, hq + 2 * kvd, axis=axis))
    qs, ks, vs = (_col_slices(q, tp, axis), _col_slices(k, tp, axis),
                  _col_slices(v, tp, axis))
    return jnp.concatenate(
        [x for r in range(tp) for x in (qs[r], ks[r], vs[r])], axis=axis)


def _unpack_p4t(p4t: jnp.ndarray) -> jnp.ndarray:
    """Tile-local packed down weight [I/2, H] -> integer int4 codes [I, H]."""
    from ..ops import int4 as int4_lib
    i2, h = p4t.shape
    tile = int4_lib.tile_for(i2 * 2)
    blk = p4t.reshape(i2 // (tile // 2), tile // 2, h)
    lo, hi = int4_lib.unpack4(blk, jnp.int8)
    return jnp.concatenate([lo, hi], axis=1).reshape(i2 * 2, h)


def _pack_p4t(q: jnp.ndarray) -> jnp.ndarray:
    """Integer int4 codes [I, H] -> tile-local packed [I/2, H] with
    tile = tile_for(I) (pack_down4's layout, minus the quantization)."""
    from ..ops import int4 as int4_lib
    i_dim, h = q.shape
    tile = int4_lib.tile_for(i_dim)
    qb = q.reshape(i_dim // tile, tile, h).astype(jnp.int32)
    lo, hi = qb[:, : tile // 2], qb[:, tile // 2:]
    return ((lo & 0xF) | ((hi & 0xF) << 4)).reshape(i_dim // 2, h
                                                    ).astype(jnp.int8)


def _repack_down_p4t(p4t: jnp.ndarray, tp: int) -> jnp.ndarray:
    """Re-lay the tile-local down pack so row-block r (of tp) is shard r's
    OWN tile-local pack of its I/tp intermediate rows. Integer codes move;
    the per-out-channel scale is untouched — bit-exact."""
    codes = _unpack_p4t(p4t)                       # [I, H] int codes
    i_dim = codes.shape[0]
    assert i_dim % tp == 0 and (i_dim // tp) % 2 == 0, (i_dim, tp)
    shards = jnp.split(codes, tp, axis=0)
    return jnp.concatenate([_pack_p4t(s) for s in shards], axis=0)


def _proj_specs(d: Params, kind: str, tp: int, cfg: LLMConfig,
                spec_only: bool = False) -> Tuple[Params, Params]:
    """(repacked leaf dict, spec dict) for one projection param dict.
    kind: "col" (q/k/v/gate/up/fc1 — output sharded), "row" (o/down/fc2 —
    input sharded, partial outputs psum), "qkv" (fused qkv4/qkv8 container),
    "rep" (replicated). spec_only=True skips the value transforms (leaves
    pass through untouched) — the AOT path derives specs from ABSTRACT
    ShapeDtypeStruct trees that the array ops cannot consume."""
    out_d, out_s = {}, {}
    for key, leaf in d.items():
        if key in ("qkv4", "qkv8"):
            sub_d, sub_s = _proj_specs(leaf, "qkv", tp, cfg, spec_only)
            out_d[key], out_s[key] = sub_d, sub_s
            continue
        nd = getattr(leaf, "ndim", 0)
        if kind == "rep":
            out_d[key], out_s[key] = leaf, P()
        elif kind == "qkv":
            # fused [q|k|v] output axis: permute so slices are local fused
            # packs. w_p4 packs along IN (global halves) so its column
            # order is untouched by the permutation of OUT columns.
            if key in ("w_q", "w_p4", "w") and nd == 2:
                out_d[key] = leaf if spec_only else _permute_qkv_cols(
                    leaf, cfg, tp, axis=1)
                out_s[key] = P(None, "tp")
            elif key in ("w_scale", "b") and nd == 1:
                out_d[key] = leaf if spec_only else _permute_qkv_cols(
                    leaf, cfg, tp, axis=0)
                out_s[key] = P("tp")
            else:
                out_d[key], out_s[key] = leaf, P()
        elif kind == "col":
            if key in ("w", "w_q", "w_p4") and nd == 2:
                out_d[key], out_s[key] = leaf, P(None, "tp")
            elif key in ("w_scale", "b") and nd == 1:
                out_d[key], out_s[key] = leaf, P("tp")
            elif key == "lora_b" and nd == 2:
                out_d[key], out_s[key] = leaf, P(None, "tp")
            else:                       # lora_a, lora_scale, a8 marker
                out_d[key], out_s[key] = leaf, P()
        elif kind == "row":
            if key in ("lora_a", "lora_b"):
                raise NotImplementedError(
                    "manual tp: LoRA on row-parallel projections (o/down) — "
                    "the reference trains q/v only; merge first")
            if key == "w_p4t" and nd == 2:
                out_d[key] = leaf if spec_only else _repack_down_p4t(leaf, tp)
                out_s[key] = P("tp", None)
            elif key in ("w", "w_q") and nd == 2:
                out_d[key], out_s[key] = leaf, P("tp", None)
            elif key == "b" and nd == 1:
                # each shard adds b with its partial sum; psum x tp -> /tp
                out_d[key] = leaf if spec_only else leaf / tp
                out_s[key] = P()
            else:                       # w_scale (per-OUT channel), a8
                out_d[key], out_s[key] = leaf, P()
        else:
            raise AssertionError(kind)
    return out_d, out_s


def repack_llm_tp(llm_params: Params, cfg: LLMConfig, tp: int,
                  spec_only: bool = False) -> Tuple[Params, Params]:
    """(params', specs): a global LLM tree laid out so shard_map's even
    slices along the spec'd axes are each device's valid local weights —
    for dense, int8 (weight-only and W8A8), fused qkv8/qkv4, and the
    nibble-packed int4 MLP formats. embed/lm_head/norms replicate."""
    if tp == 1:
        specs = jax.tree_util.tree_map(lambda _: P(), llm_params)
        return llm_params, specs
    out, specs = {}, {}
    for key, val in llm_params.items():
        if key == "layers":
            new_layers, spec_layers = [], []
            for layer in val:
                nl, sl = {}, {}
                for gk, gv in layer.items():
                    if gk == "attn":
                        nd, sd = {}, {}
                        for pk, pv in gv.items():
                            if pk in ("qkv4", "qkv8"):
                                nd[pk], sd[pk] = _proj_specs(pv, "qkv", tp,
                                                             cfg, spec_only)
                            elif pk in ("q", "k", "v"):
                                nd[pk], sd[pk] = _proj_specs(pv, "col", tp,
                                                             cfg, spec_only)
                            elif pk == "o":
                                nd[pk], sd[pk] = _proj_specs(pv, "row", tp,
                                                             cfg, spec_only)
                            else:
                                nd[pk], sd[pk] = _proj_specs(
                                    pv, "rep", tp, cfg) if isinstance(
                                        pv, dict) else (pv, P())
                        nl[gk], sl[gk] = nd, sd
                    elif gk == "mlp":
                        nd, sd = {}, {}
                        for pk, pv in gv.items():
                            if pk in ("down", "fc2"):
                                nd[pk], sd[pk] = _proj_specs(pv, "row", tp,
                                                             cfg, spec_only)
                            elif pk in ("gate", "up", "fc1"):
                                nd[pk], sd[pk] = _proj_specs(pv, "col", tp,
                                                             cfg, spec_only)
                            else:
                                nd[pk], sd[pk] = _proj_specs(
                                    pv, "rep", tp, cfg) if isinstance(
                                        pv, dict) else (pv, P())
                        nl[gk], sl[gk] = nd, sd
                    else:               # norms
                        nl[gk] = gv
                        sl[gk] = jax.tree_util.tree_map(lambda _: P(), gv)
                new_layers.append(nl)
                spec_layers.append(sl)
            out[key], specs[key] = new_layers, spec_layers
        else:                           # embed_tokens / final_norm / lm_head
            out[key] = val
            specs[key] = jax.tree_util.tree_map(lambda _: P(), val)
    return out, specs


def repack_params(params: Params, cfg, mesh: Mesh,
                  place: bool = True,
                  spec_only: bool = False) -> Tuple[Params, Params]:
    """Full WalkGPT tree: the LLM repacks for tp; every other module
    (SAM, CLIP, MSQP, CTP, TinyCrossAttn, mm_projector) replicates. With
    place=True the repacked tree is device_put onto the mesh with the
    matching shardings, so shard_map consumes it without resharding."""
    tp = mesh.shape.get("tp", 1)
    out, specs = {}, {}
    for key, val in params.items():
        if key == "llm":
            out[key], specs[key] = repack_llm_tp(val, cfg.llm, tp,
                                                 spec_only=spec_only)
        else:
            out[key] = val
            specs[key] = jax.tree_util.tree_map(lambda _: P(), val)
    if place and not spec_only:
        def put(x, s):
            if not hasattr(x, "ndim"):
                return x
            return jax.device_put(x, NamedSharding(mesh, s))
        out = jax.tree_util.tree_map(put, out, specs)
    return out, specs


# ---------------------------------------------------------------------------
# the dp x tp shard_map generate
# ---------------------------------------------------------------------------

def _shard_map():
    try:
        from jax import shard_map
        return shard_map, {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        return shard_map, {"check_rep": False}


def plan_dp_rows(row_image_idx, input_ids, dp: int, n_images: int,
                 image_token_id: int = -200):
    """Host-side row partitioning plan for a dp split.

    Images split into dp contiguous shards of B/dp. Conversation rows are
    INDEPENDENT computations (per-row attention), so they may be permuted
    freely: every row that CARRIES an image (has the -200 sentinel) is
    assigned to its image's shard; sentinel-free rows (collate pad rows —
    their visual block is masked out of attention, so their image index is
    inert) fill the remaining slots. The caller permutes the row arrays by
    `perm`, runs shard s on permuted rows [s*R/dp, (s+1)*R/dp), and
    un-permutes outputs; segs re-sort to the EXACT single-device row-major
    pack order via a stable sort on the original row index.

    Returns (perm [R], inv_perm [R], local_rii [R] — PERMUTED order, values
    in [0, B/dp)) or None when infeasible (a shard's real rows exceed R/dp,
    or R/B do not divide dp)."""
    rii = np.asarray(row_image_idx)
    ids = np.asarray(input_ids)
    r = rii.shape[0]
    if r % dp or n_images % dp:
        return None
    rows_per, imgs_per = r // dp, n_images // dp
    has_img = (ids == image_token_id).any(axis=1)
    shards = [[] for _ in range(dp)]
    for i in range(r):
        if has_img[i]:
            shards[int(rii[i]) // imgs_per].append(i)
    free = [i for i in range(r) if not has_img[i]]
    for s in range(dp):
        need = rows_per - len(shards[s])
        if need < 0:
            return None
        shards[s] += free[:need]
        free = free[need:]
    perm = np.asarray([i for s in shards for i in s], np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(r, dtype=np.int32)
    local = np.empty((r,), np.int32)
    for s in range(dp):
        sl = slice(s * rows_per, (s + 1) * rows_per)
        local[sl] = np.clip(rii[perm[sl]] - s * imgs_per, 0, imgs_per - 1)
    return perm, inv, local


def _compact_segs_sorted(seg_valid, seg_rows_orig, pred_embeddings,
                         max_segs: int, n_rows: int):
    """Compact dp x max_segs per-shard seg slots to the first max_segs in
    ORIGINAL row-major order: a stable sort on the original row index
    reproduces the single-device pack order exactly (within-row order is
    preserved per shard; a row lives in exactly one shard)."""
    key = jnp.where(seg_valid, seg_rows_orig, n_rows)
    order = jnp.argsort(key, stable=True)
    sel = order[:max_segs]
    n_valid = jnp.minimum(seg_valid.sum(), max_segs)
    keep = jnp.arange(max_segs) < n_valid
    return (keep, jnp.where(keep, seg_rows_orig[sel], 0),
            pred_embeddings[sel])


def make_tp_generate(mesh: Mesh, cfg, param_specs: Params, *,
                     max_new_tokens: int, max_segs: int, eos_id: int,
                     speculative_k: int = 0,
                     encode_shard="auto"):
    """shard_map dp x tp generate_and_segment with the full production
    kernel set under tp (module docstring). Call with params from
    repack_params (param_specs is its spec tree).

    The decode + [SEG]->CTP stage runs per device (generate_seg_embeds);
    the [max_segs, 256] embeddings come out of the shard_map, compact
    globally (exact single-device seg packing for ANY seg distribution),
    and the mask decode runs ONCE outside on the gathered features — no
    per-replica canvas transients and no per-shard seg-budget skew.

    Contracts (host-checked): mesh axes ("dp", "tp"); rows/images
    co-partition under the dp split (plan_dp_rows — the collate layout
    with B % dp == 0; arbitrary rounds-per-image supported up to the
    per-shard row capacity); SAM visual stream (the CLIP stream stays on
    the GSPMD path). encode_shard: True splits SAM encode over ALL dp*tp
    devices (requires B % (dp*tp) == 0) with one tp all_gather; False
    replicates encode within each tp group; "auto" (default) picks per
    call by divisibility."""
    assert tuple(mesh.axis_names) == ("dp", "tp"), mesh.axis_names
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    cfg_l = dataclasses.replace(cfg, llm=tp_llm_cfg(cfg.llm, tp))
    tp_axis = "tp" if tp > 1 else None

    def local_fn2(params, sam_tokens, input_ids, attention_mask,
                  row_image_idx):
        from ..models import walkgpt
        return walkgpt.generate_seg_embeds(
            params, cfg_l, sam_tokens=sam_tokens, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            max_new_tokens=max_new_tokens, max_segs=max_segs, eos_id=eos_id,
            speculative_k=speculative_k, tp_axis=tp_axis)

    jitted = {}            # encode_shard mode -> compiled wrapper

    def get_jitted(enc: bool):
        if enc not in jitted:
            smapped = _make_tp_embeds_rii(mesh, cfg, param_specs, local_fn2,
                                          enc)

            def wrapper(params, images, ids_perm, mask_perm, rii_local,
                        perm_arr, inv_arr, row_image_idx, pixel_hw):
                from ..models import walkgpt
                from ..models.walkgpt import EvaluateOutput
                se, feats = smapped(params, images, ids_perm, mask_perm,
                                    rii_local)
                orig_rows = perm_arr[se.seg_rows]   # permuted -> original
                keep, rows, emb = _compact_segs_sorted(
                    se.seg_valid, orig_rows, se.pred_embeddings, max_segs,
                    ids_perm.shape[0])
                canvas, score = walkgpt.decode_seg_masks(
                    params, cfg, feats, emb, row_image_idx[rows], pixel_hw)
                return EvaluateOutput(tokens=se.tokens[inv_arr],
                                      lengths=se.lengths[inv_arr],
                                      pred_masks=canvas, seg_valid=keep,
                                      seg_rows=rows,
                                      mask_scores=jnp.where(keep, score,
                                                            0.0))
            jitted[enc] = jax.jit(wrapper)
        return jitted[enc]

    def checked(params, images, input_ids, attention_mask, row_image_idx,
                pixel_hw, lower_only: bool = False):
        """lower_only=True returns jax.jit(...).lower(...) instead of
        executing — the AOT scale test lowers the 13B tp=8 program with
        ABSTRACT params/images (input_ids etc. stay concrete: the host
        row-permutation plan reads their values)."""
        b = int(images.shape[0])
        plan = plan_dp_rows(row_image_idx, input_ids, dp, b,
                            cfg.image_token_id)
        assert plan is not None, \
            "make_tp_generate: rows cannot partition over " \
            f"dp={dp} shards (see plan_dp_rows)"
        perm, inv, local = plan
        enc = _pick_encode_shard(encode_shard, b, dp, tp)
        ids = np.asarray(input_ids)[perm]
        msk = np.asarray(attention_mask)[perm]
        args = (params, images, jnp.asarray(ids), jnp.asarray(msk),
                jnp.asarray(local), jnp.asarray(perm),
                jnp.asarray(inv), jnp.asarray(row_image_idx),
                jnp.asarray(pixel_hw))
        if lower_only:
            return get_jitted(enc).lower(*args)
        return get_jitted(enc)(*args)
    return checked


def _pick_encode_shard(encode_shard, b: int, dp: int, tp: int) -> bool:
    if encode_shard == "auto":
        return b % (dp * tp) == 0
    enc = bool(encode_shard)
    need = dp * tp if enc else dp
    assert b % need == 0, (b, dp, tp, encode_shard)
    return enc


def _make_tp_embeds_rii(mesh: Mesh, cfg, param_specs, local_fn,
                        encode_shard):
    """_make_tp_embeds variant whose local_fn also takes the LOCAL
    row_image_idx (P('dp')-sharded)."""
    from ..models.walkgpt import SegEmbeds
    shard_map, smap_kw = _shard_map()

    def local(params, images, input_ids, attention_mask, rii_local):
        from ..models import walkgpt
        if encode_shard:
            feats_l, toks_l = walkgpt.encode_sam(params, cfg, images)
            feats = jax.lax.all_gather(feats_l, "tp", axis=0, tiled=True)
            sam_tokens = jax.lax.all_gather(toks_l, "tp", axis=0, tiled=True)
        else:
            feats, sam_tokens = walkgpt.encode_sam(params, cfg, images)
        se = local_fn(params, sam_tokens, input_ids, attention_mask,
                      rii_local)
        idx = jax.lax.axis_index("dp")
        rows = jnp.where(se.seg_valid,
                         se.seg_rows + idx * input_ids.shape[0], 0)
        return se._replace(seg_rows=rows), feats

    img_spec = P(("dp", "tp")) if encode_shard else P("dp")
    se_specs = SegEmbeds(tokens=P("dp"), lengths=P("dp"), seg_valid=P("dp"),
                         seg_rows=P("dp"), pred_embeddings=P("dp"))
    return shard_map(
        local, mesh=mesh,
        in_specs=(param_specs, img_spec, P("dp"), P("dp"), P("dp")),
        out_specs=(se_specs, P("dp")), **smap_kw)


def make_tp_forward(mesh: Mesh, cfg, param_specs: Params, *, max_segs: int,
                    encode_shard="auto"):
    """Teacher-forced eval pass (runtime/evaluate's fwd program) under the
    same manual dp x tp scheme: per-shard teacher_seg_embeds -> global
    compaction -> one mask decode + device IoU counts outside. Losses are
    NOT computed (eval harvests seg identities + counts only) — the
    returned ForwardOutput carries NaN loss fields.

    Returns fn(params, images, input_ids, labels, attention_mask,
    row_image_idx, gt_masks, pixel_hw) -> (ForwardOutput, counts[M, 3, 2])
    — the _jit_caches fwd contract."""
    assert tuple(mesh.axis_names) == ("dp", "tp"), mesh.axis_names
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    cfg_l = dataclasses.replace(cfg, llm=tp_llm_cfg(cfg.llm, tp))
    tp_axis = "tp" if tp > 1 else None

    def local_fn(params, sam_tokens, input_ids, attention_mask, rii_local):
        from ..models import walkgpt
        return walkgpt.teacher_seg_embeds(
            params, cfg_l, sam_tokens=sam_tokens, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=rii_local,
            max_segs=max_segs, tp_axis=tp_axis)

    jitted = {}

    def get_jitted(enc: bool):
        if enc not in jitted:
            smapped = _make_tp_embeds_rii(mesh, cfg, param_specs, local_fn,
                                          enc)

            def wrapper(params, images, ids_perm, mask_perm, rii_local,
                        perm_arr, row_image_idx, gt_masks, pixel_hw):
                from ..eval.metrics import device_mask_counts
                from ..models import walkgpt
                from ..models.walkgpt import ForwardOutput
                se, feats = smapped(params, images, ids_perm, mask_perm,
                                    rii_local)
                orig_rows = perm_arr[se.seg_rows]
                keep, rows, emb = _compact_segs_sorted(
                    se.seg_valid, orig_rows, se.pred_embeddings, max_segs,
                    ids_perm.shape[0])
                canvas, score = walkgpt.decode_seg_masks(
                    params, cfg, feats, emb, row_image_idx[rows], pixel_hw)
                nan = jnp.float32(jnp.nan)
                out = ForwardOutput(loss=nan, ce_loss=nan, mask_bce_loss=nan,
                                    mask_dice_loss=nan, nce_loss=nan,
                                    mask_loss=nan, pred_masks=canvas,
                                    seg_valid=keep, seg_rows=rows,
                                    mask_scores=jnp.where(keep, score, 0.0))
                counts = device_mask_counts(canvas,
                                            gt_masks.astype(jnp.float32),
                                            rows, row_image_idx, pixel_hw)
                return out, counts
            jitted[enc] = jax.jit(wrapper)
        return jitted[enc]

    def checked(params, images, input_ids, labels, attention_mask,
                row_image_idx, gt_masks, pixel_hw):
        del labels                           # teacher path reads input_ids
        b = int(images.shape[0])
        plan = plan_dp_rows(row_image_idx, input_ids, dp, b,
                            cfg.image_token_id)
        assert plan is not None, \
            "make_tp_forward: rows cannot partition over " \
            f"dp={dp} shards (see plan_dp_rows)"
        perm, _inv, local = plan
        enc = _pick_encode_shard(encode_shard, b, dp, tp)
        ids = np.asarray(input_ids)[perm]
        msk = np.asarray(attention_mask)[perm]
        return get_jitted(enc)(
            params, images, jnp.asarray(ids), jnp.asarray(msk),
            jnp.asarray(local), jnp.asarray(perm),
            jnp.asarray(row_image_idx), gt_masks, jnp.asarray(pixel_hw))
    return checked
