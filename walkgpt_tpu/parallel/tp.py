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


def _proj_specs(d: Params, kind: str, tp: int, cfg: LLMConfig
                ) -> Tuple[Params, Params]:
    """(repacked leaf dict, spec dict) for one projection param dict.
    kind: "col" (q/k/v/gate/up/fc1 — output sharded), "row" (o/down/fc2 —
    input sharded, partial outputs psum), "qkv" (fused qkv4/qkv8 container),
    "rep" (replicated)."""
    out_d, out_s = {}, {}
    for key, leaf in d.items():
        if key in ("qkv4", "qkv8"):
            sub_d, sub_s = _proj_specs(leaf, "qkv", tp, cfg)
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
                out_d[key] = _permute_qkv_cols(leaf, cfg, tp, axis=1)
                out_s[key] = P(None, "tp")
            elif key in ("w_scale", "b") and nd == 1:
                out_d[key] = _permute_qkv_cols(leaf, cfg, tp, axis=0)
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
                out_d[key] = _repack_down_p4t(leaf, tp)
                out_s[key] = P("tp", None)
            elif key in ("w", "w_q") and nd == 2:
                out_d[key], out_s[key] = leaf, P("tp", None)
            elif key == "b" and nd == 1:
                # each shard adds b with its partial sum; psum x tp -> /tp
                out_d[key] = leaf / tp
                out_s[key] = P()
            else:                       # w_scale (per-OUT channel), a8
                out_d[key], out_s[key] = leaf, P()
        else:
            raise AssertionError(kind)
    return out_d, out_s


def repack_llm_tp(llm_params: Params, cfg: LLMConfig, tp: int
                  ) -> Tuple[Params, Params]:
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
                                                             cfg)
                            elif pk in ("q", "k", "v"):
                                nd[pk], sd[pk] = _proj_specs(pv, "col", tp,
                                                             cfg)
                            elif pk == "o":
                                nd[pk], sd[pk] = _proj_specs(pv, "row", tp,
                                                             cfg)
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
                                                             cfg)
                            elif pk in ("gate", "up", "fc1"):
                                nd[pk], sd[pk] = _proj_specs(pv, "col", tp,
                                                             cfg)
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
                  place: bool = True) -> Tuple[Params, Params]:
    """Full WalkGPT tree: the LLM repacks for tp; every other module
    (SAM, CLIP, MSQP, CTP, TinyCrossAttn, mm_projector) replicates. With
    place=True the repacked tree is device_put onto the mesh with the
    matching shardings, so shard_map consumes it without resharding."""
    tp = mesh.shape.get("tp", 1)
    out, specs = {}, {}
    for key, val in params.items():
        if key == "llm":
            out[key], specs[key] = repack_llm_tp(val, cfg.llm, tp)
        else:
            out[key] = val
            specs[key] = jax.tree_util.tree_map(lambda _: P(), val)
    if place:
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


def make_tp_generate(mesh: Mesh, cfg, param_specs: Params, *,
                     max_new_tokens: int, max_segs: int, eos_id: int,
                     speculative_k: int = 0,
                     shard_seg_budget: str = "split",
                     encode_shard: bool = True):
    """shard_map dp x tp generate_and_segment with the full production
    kernel set under tp (module docstring). Call with params from
    repack_params (param_specs is its spec tree).

    Contracts (asserted): mesh axes ("dp", "tp"); one conversation row per
    image (row_image_idx == arange(B)); B % dp == 0 (and % (dp*tp) with
    encode_shard=True, which splits SAM encode over every device);
    max_segs % dp == 0; visual_stream "sam" (the PAVE validate route —
    the CLIP stream stays on the GSPMD path).
    shard_seg_budget as in parallel/infer.make_dp_generate ("split": fast
    per-shard max_segs/dp budget; "full": exact single-device semantics)."""
    assert tuple(mesh.axis_names) == ("dp", "tp"), mesh.axis_names
    assert shard_seg_budget in ("split", "full"), shard_seg_budget
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    assert max_segs % dp == 0, (max_segs, dp)
    local_segs = max_segs if shard_seg_budget == "full" else max_segs // dp
    cfg_l = dataclasses.replace(cfg, llm=tp_llm_cfg(cfg.llm, tp))
    tp_axis = "tp" if tp > 1 else None
    shard_map, smap_kw = _shard_map()

    def local(params, images, input_ids, attention_mask, pixel_hw):
        from ..models import walkgpt
        if encode_shard:
            # every device encodes its B/(dp*tp) images with the FULL SAM
            # config, then the tp group reassembles its dp shard's features
            feats_l, toks_l = walkgpt.encode_sam(params, cfg, images)
            feats = jax.lax.all_gather(feats_l, "tp", axis=0, tiled=True)
            sam_tokens = jax.lax.all_gather(toks_l, "tp", axis=0, tiled=True)
        else:
            feats, sam_tokens = walkgpt.encode_sam(params, cfg, images)
        b = feats.shape[0]
        out = walkgpt.generate_and_segment(
            params, cfg_l, images=images, input_ids=input_ids,
            attention_mask=attention_mask,
            row_image_idx=jnp.arange(b, dtype=jnp.int32),
            pixel_hw=pixel_hw, max_new_tokens=max_new_tokens,
            max_segs=local_segs, eos_id=eos_id,
            speculative_k=speculative_k,
            precomputed_sam=(feats, sam_tokens), tp_axis=tp_axis)
        idx = jax.lax.axis_index("dp")
        seg_rows = jnp.where(out.seg_valid, out.seg_rows + idx * b, 0)
        return out._replace(seg_rows=seg_rows)

    from ..models.walkgpt import EvaluateOutput
    img_spec = P(("dp", "tp")) if encode_shard else P("dp")
    out_specs = EvaluateOutput(tokens=P("dp"), lengths=P("dp"),
                               pred_masks=P("dp"), seg_valid=P("dp"),
                               seg_rows=P("dp"), mask_scores=P("dp"))
    smapped = shard_map(
        local, mesh=mesh,
        in_specs=(param_specs, img_spec, P("dp"), P("dp"), P("dp")),
        out_specs=out_specs, **smap_kw)

    def wrapper(params, images, input_ids, attention_mask, pixel_hw):
        out = smapped(params, images, input_ids, attention_mask, pixel_hw)
        if shard_seg_budget == "full":
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
        rii = np.asarray(row_image_idx)
        b = rii.shape[0]
        assert np.array_equal(rii, np.arange(b)), \
            "make_tp_generate requires row_image_idx == arange(B)"
        need = dp * tp if encode_shard else dp
        assert b % need == 0, (b, dp, tp, encode_shard)
        return jitted(params, images, input_ids, attention_mask, pixel_hw)
    return checked
