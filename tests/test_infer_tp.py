"""Manual tensor-parallel (shard_map dp x tp) inference — parallel/tp.py.

The round-5 flagship: tp > 1 mesh inference KEEPING the production Pallas
kernels and quantized flat caches (the GSPMD path downgrades those —
parallel/infer.mesh_config). Token identity is asserted against the
SINGLE-DEVICE program with the same weights for every production format;
the repack transform is asserted bit-exact on the integer codes.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from walkgpt_tpu.core.config import tiny_config
from walkgpt_tpu.models import walkgpt
from walkgpt_tpu.parallel import tp as tpmod

GEN_KW = dict(max_new_tokens=6, max_segs=8, eos_id=2)


def _inputs(cfg, b=4, t=12):
    rng = np.random.RandomState(0)
    s = cfg.sam.img_size
    images = jnp.asarray(rng.randn(b, s, s, 3), jnp.float32)
    ids = np.full((b, t), 5, np.int32)
    ids[:, 0] = 1
    ids[:, 3] = -200
    return (images, jnp.asarray(ids), jnp.ones((b, t), bool),
            jnp.arange(b, dtype=jnp.int32), jnp.full((b, 2), s, jnp.int32))


def _single_device(params, cfg, inputs, **kw):
    images, ids, attn, rii, hw = inputs
    return jax.jit(lambda p, im, ii, am, ri, phw: walkgpt.generate_and_segment(
        p, cfg, images=im, input_ids=ii, attention_mask=am, row_image_idx=ri,
        pixel_hw=phw, **{**GEN_KW, **kw}))(params, images, ids, attn, rii, hw)


def _mesh(dp, tp):
    return Mesh(np.array(jax.devices()[: dp * tp]).reshape(dp, tp),
                ("dp", "tp"))


def test_tp_dense_token_and_mask_identity():
    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    # bias lm_head toward [SEG] so masks actually flow
    w = np.array(params["llm"]["lm_head"]["w"], copy=True)
    w[:, cfg.seg_token_id] += 8.0
    params["llm"]["lm_head"]["w"] = jnp.asarray(w)
    inputs = _inputs(cfg)
    ref = _single_device(params, cfg, inputs)
    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, **GEN_KW)
    out = fn(tp_params, *inputs)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(ref.lengths))
    rsv = np.asarray(ref.seg_valid)
    sv = np.asarray(out.seg_valid)
    assert sv.sum() == rsv.sum() and rsv.sum() > 0
    np.testing.assert_array_equal(np.asarray(out.seg_rows)[sv],
                                  np.asarray(ref.seg_rows)[rsv])
    # masks replicate within a tp group; drift vs single device is psum
    # float reassociation only
    drift = np.abs(np.asarray(out.pred_masks)[sv]
                   - np.asarray(ref.pred_masks)[rsv]).max()
    assert drift < 1e-3, drift


@pytest.mark.parametrize("kvq,qmode", [("int8_flat", "w8a8"),
                                       ("int4_flat", "int4x")])
def test_tp_quantized_formats_token_identity(kvq, qmode):
    """The PRODUCTION combos: fused qkv8/qkv4 + int8/int4 MLP weights with
    the banded Pallas decode kernel over the quantized flat cache, all
    under tp=2 — the exact kernel set the GSPMD path cannot shard."""
    cfg = tiny_config().replace(kv_quant_cache=kvq)
    quant_kw = (dict(act_quant=True) if qmode == "w8a8"
                else dict(act_quant=True, mlp_int4=True, attn_int4=True,
                          head_int4=True))
    params = walkgpt.init_quantized(jax.random.PRNGKey(0), cfg, jnp.float32,
                                    **quant_kw)
    inputs = _inputs(cfg)
    ref = _single_device(params, cfg, inputs)
    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, **GEN_KW)
    out = fn(tp_params, *inputs)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


@pytest.mark.slow
@pytest.mark.parametrize("kvq,qmode", [("int4_flat", "w8a8"),
                                       ("int8_flat", "int4x")])
def test_tp_quantized_formats_cross_combos(kvq, qmode):
    test_tp_quantized_formats_token_identity(kvq, qmode)


def test_tp4_single_kv_head_per_device():
    """tp = n_kv: one kv head per device (the 13B tp=8 shape has 5)."""
    cfg = tiny_config().replace(kv_quant_cache="int8_flat")
    params = walkgpt.init_quantized(jax.random.PRNGKey(1), cfg, jnp.float32,
                                    act_quant=True)
    inputs = _inputs(cfg)
    ref = _single_device(params, cfg, inputs)
    mesh = _mesh(1, 4)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, **GEN_KW)
    out = fn(tp_params, *inputs)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_tp_gqa_groups_stay_intact():
    """GQA (n_rep = 2) under tp: contiguous head-block slicing must keep
    each kv head with its query group."""
    base = tiny_config()
    cfg = base.replace(llm=dataclasses.replace(base.llm, num_kv_heads=2),
                       kv_quant_cache="int4_flat")
    params = walkgpt.init_quantized(jax.random.PRNGKey(2), cfg, jnp.float32,
                                    act_quant=True, mlp_int4=True,
                                    attn_int4=True)
    inputs = _inputs(cfg)
    ref = _single_device(params, cfg, inputs)
    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, **GEN_KW)
    out = fn(tp_params, *inputs)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_tp_speculative_composes():
    """Speculative decode (banded chunk kernel) under tp=2: tokens match
    the SINGLE-DEVICE speculative run (greedy-exact on CPU/interpret)."""
    cfg = tiny_config().replace(kv_quant_cache="int8_flat")
    params = walkgpt.init_quantized(jax.random.PRNGKey(0), cfg, jnp.float32,
                                    act_quant=True)
    inputs = _inputs(cfg)
    ref = _single_device(params, cfg, inputs, speculative_k=4)
    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, speculative_k=4, **GEN_KW)
    out = fn(tp_params, *inputs)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_repack_bit_exact():
    """The repacked quantized weights dequantize EXACTLY to the original
    per-shard slices (integer codes move, scales untouched)."""
    from walkgpt_tpu.ops import int4 as int4_lib
    cfg = tiny_config()
    lcfg = cfg.llm
    params = walkgpt.init_quantized(jax.random.PRNGKey(0), cfg, jnp.float32,
                                    act_quant=True, mlp_int4=True,
                                    attn_int4=True)
    tp = 2
    layer = params["llm"]["layers"][0]
    new_llm, _ = tpmod.repack_llm_tp(params["llm"], lcfg, tp)
    nl = new_llm["layers"][0]

    # fused qkv4: shard r's fused [q_r|k_r|v_r] dequant == original slices
    w_ref = int4_lib.dequantize4(layer["attn"]["qkv4"])       # [H, 3H']
    w_new = int4_lib.dequantize4(nl["attn"]["qkv4"])
    hq = lcfg.num_heads * lcfg.head_dim
    kvd = lcfg.num_kv_heads * lcfg.head_dim
    per = (hq + 2 * kvd) // tp
    for r in range(tp):
        blk = np.asarray(w_new[:, r * per:(r + 1) * per])
        qs = np.asarray(w_ref[:, r * hq // tp:(r + 1) * hq // tp])
        ks = np.asarray(w_ref[:, hq + r * kvd // tp:hq + (r + 1) * kvd // tp])
        vs = np.asarray(w_ref[:, hq + kvd + r * kvd // tp:
                              hq + kvd + (r + 1) * kvd // tp])
        np.testing.assert_array_equal(blk, np.concatenate([qs, ks, vs], 1))

    # tile-local down pack: shard r's rows dequant == original rows
    down_ref = np.asarray(int4_lib.dequantize_down4(layer["mlp"]["down"]))
    p4t_new = nl["mlp"]["down"]["w_p4t"]
    i_dim = down_ref.shape[0]
    loc = i_dim // tp
    for r in range(tp):
        shard_pack = {"w_p4t": p4t_new[r * loc // 2:(r + 1) * loc // 2],
                      "w_scale": nl["mlp"]["down"]["w_scale"]}
        np.testing.assert_array_equal(
            np.asarray(int4_lib.dequantize_down4(shard_pack)),
            down_ref[r * loc:(r + 1) * loc])


def test_tp_contract_asserts():
    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_generate(mesh, cfg, specs, **GEN_KW)
    images, ids, attn, rii, hw = _inputs(cfg)
    with pytest.raises(AssertionError):
        fn(tp_params, images, ids, attn, jnp.zeros_like(rii), hw)


def test_tp_forward_teacher_pass_with_row_permutation():
    """make_tp_forward vs the single-device teacher-forced fwd program on a
    layout that REQUIRES the host row-permutation plan: image 0 carries two
    conversation rounds and pad rows sit at the end (the collate layout) —
    a naive contiguous dp split would cut image shards. Counts, seg rows,
    and masks must match the single-device program exactly."""
    from walkgpt_tpu.eval.metrics import device_mask_counts

    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(3), cfg, jnp.float32)
    B, T, S = 4, 16, cfg.sam.img_size
    max_segs = 8
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    # rows: [img0 r0, img0 r1, img1, img2, img3, pad, pad, pad]
    R = 8
    ids = np.zeros((R, T), np.int32)
    attn = np.zeros((R, T), bool)
    sid = cfg.seg_token_id
    rii = np.array([0, 0, 1, 2, 3, 0, 0, 0], np.int32)
    for j in range(5):
        ids[j, :8] = [1, 5, -200, 6, sid, 7, sid, 2]
        attn[j, :8] = True
    for j in range(5, 8):            # pad rows: one live token, no sentinel
        ids[j, 0] = 1
        attn[j, 0] = True
    labels = np.full((R, T), -100, np.int32)
    gt = rng.rand(max_segs, S, S) > 0.5
    gt_masks = jnp.asarray(gt, jnp.float32)
    pixel_hw = jnp.full((B, 2), S, jnp.int32)

    def single(params, images, input_ids, labels, attention_mask,
               row_image_idx, gt_masks, pixel_hw):
        out = walkgpt.model_forward(
            params, cfg, images=images, input_ids=input_ids, labels=labels,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            gt_masks=gt_masks, pixel_hw=pixel_hw, max_segs=max_segs)
        counts = device_mask_counts(out.pred_masks, gt_masks, out.seg_rows,
                                    row_image_idx, pixel_hw)
        return out, counts

    args = (jnp.asarray(images), jnp.asarray(ids), jnp.asarray(labels),
            jnp.asarray(attn), jnp.asarray(rii), gt_masks, pixel_hw)
    ref, ref_counts = jax.jit(single)(params, *args)

    mesh = _mesh(2, 2)
    tp_params, specs = tpmod.repack_params(params, cfg, mesh)
    fn = tpmod.make_tp_forward(mesh, cfg, specs, max_segs=max_segs)
    out, counts = fn(tp_params, *args)

    rsv, sv = np.asarray(ref.seg_valid), np.asarray(out.seg_valid)
    assert rsv.sum() == 10 - 0 or rsv.sum() > 0   # 5 rows x 2 segs, capped 8
    np.testing.assert_array_equal(sv, rsv)
    np.testing.assert_array_equal(np.asarray(out.seg_rows),
                                  np.asarray(ref.seg_rows))
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts),
                               rtol=0, atol=1e-3)
    drift = np.abs(np.asarray(out.pred_masks)[sv]
                   - np.asarray(ref.pred_masks)[rsv]).max()
    assert drift < 1e-3, drift


def test_plan_dp_rows_edge_cases():
    """Host row-partition planner: feasible skew, pad-row filling,
    infeasible overload, non-divisible shapes."""
    I = -200  # image sentinel column marker

    def ids_for(has_img):
        out = np.zeros((len(has_img), 4), np.int32)
        out[:, 0] = 1
        for i, h in enumerate(has_img):
            if h:
                out[i, 2] = I
        return out

    # skewed rounds: img0 has 3 rows, img1 has 1; dp=2 -> shard0 must give
    # one of its real rows? no — shard0 (img0) holds 3 real + shard1 (img1)
    # 1 real + pads fill to 4/4 with R=8
    rii = np.array([0, 0, 0, 1, 0, 0, 0, 0], np.int32)
    has = [True, True, True, True, False, False, False, False]
    plan = tpmod.plan_dp_rows(rii, ids_for(has), dp=2, n_images=2)
    assert plan is not None
    perm, inv, local = plan
    assert sorted(perm[:4].tolist()) == [0, 1, 2, 4] or \
        sorted(perm[:4].tolist())[:3] == [0, 1, 2]
    np.testing.assert_array_equal(perm[inv], np.arange(8))
    assert local.max() == 0          # 1 image per shard -> local idx 0

    # overload: 5 real rows for shard0's image but only 4 slots
    rii = np.array([0, 0, 0, 0, 0, 1, 0, 0], np.int32)
    has = [True] * 6 + [False, False]
    assert tpmod.plan_dp_rows(rii, ids_for(has), dp=2, n_images=2) is None

    # non-divisible image count
    rii = np.array([0, 1, 2, 0], np.int32)
    has = [True, True, True, False]
    assert tpmod.plan_dp_rows(rii, ids_for(has), dp=2, n_images=3) is None
