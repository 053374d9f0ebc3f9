"""Sharded (dp x tp) INFERENCE — BASELINE config 5 ("13B on a v5e-8 slice:
sharded towers, streaming PAVE eval"; reference distributes eval via NCCL +
DistributedSampler, evaluation_walkgpt.py:125-141,393-401).

Token-identity contract: the mesh-sharded generate_and_segment must emit the
SAME greedy tokens as the single-device program (argmax over fp32 logits),
with masks matching to float-reassociation noise. Runs on the 8-virtual-CPU
mesh from conftest.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from walkgpt_tpu.core.config import tiny_config
from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
from walkgpt_tpu.models import walkgpt
from walkgpt_tpu.parallel import infer, sharding as shd

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    tok = ByteTokenizer(2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    s = cfg.sam.img_size
    B, R, T = 4, 8, 32
    images = jnp.asarray(rng.randn(B, s, s, 3), jnp.float32)
    ids = np.full((R, T), 65, np.int64)
    ids[:, 5] = -200
    args = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((R, T), bool),
        row_image_idx=jnp.asarray(np.arange(R) % B, jnp.int32),
        pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (B, 2)))
    return tok, cfg, params, images, args


def _reference(cfg, tok, params, images, args, max_new=16, max_segs=16):
    def gen(params, images, input_ids, attention_mask, row_image_idx,
            pixel_hw):
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            pixel_hw=pixel_hw, max_new_tokens=max_new, max_segs=max_segs,
            eos_id=tok.eos_token_id)
    return jax.jit(gen)(params, images, **args)


@pytest.mark.parametrize("kv", ["", "int8", "int8_flat", "int4_flat"])
def test_gspmd_generate_token_identity(setup, kv):
    """dp=2 x tp=4 GSPMD generate: tokens identical to single-device for
    every KV-cache format (flat quantized layouts run via interpret-mode
    Pallas on CPU — see parallel/infer.mesh_config)."""
    tok, cfg, params, images, args = setup
    cfg = cfg.replace(kv_quant_cache=kv or False)
    ref = _reference(cfg, tok, params, images, args)
    mesh = shd.make_mesh(dp=2, tp=4)
    sp = infer.shard_params(params, mesh)
    fn = infer.make_sharded_generate(mesh, cfg, max_new_tokens=16,
                                     max_segs=16, eos_id=tok.eos_token_id)
    out = fn(sp, images, args["input_ids"], args["attention_mask"],
             args["row_image_idx"], args["pixel_hw"])
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(out.lengths))
    np.testing.assert_array_equal(np.asarray(ref.seg_valid),
                                  np.asarray(out.seg_valid))
    np.testing.assert_allclose(np.asarray(ref.pred_masks),
                               np.asarray(out.pred_masks),
                               rtol=1e-4, atol=1e-4)


def test_gspmd_params_actually_sharded(setup):
    """The big projections really distribute over tp (not silently
    replicated) and the int8-quantized leaves follow the same rules."""
    tok, cfg, params, images, args = setup
    mesh = shd.make_mesh(dp=2, tp=4)
    sp = infer.shard_params(params, mesh)
    qw = sp["llm"]["layers"][0]["attn"]["q"]["w"]
    assert qw.sharding.spec == P(None, "tp")
    from walkgpt_tpu.ops.quant import quantize_llm
    qparams = dict(params, llm=quantize_llm(params["llm"]))
    specs = shd.param_pspecs(qparams, tp=4)
    flat = {shd._path_str(p): s for p, s in
            jax.tree_util.tree_flatten_with_path(specs)[0]}
    assert flat["llm/layers/0/attn/q/w_q"] == P(None, "tp")
    assert flat["llm/layers/0/attn/q/w_scale"] == P("tp")
    assert flat["llm/layers/0/attn/o/w_q"] == P("tp", None)
    assert flat["llm/layers/0/attn/o/w_scale"] == P()
    assert flat["llm/layers/0/mlp/down/w_q"] == P("tp", None)
    assert flat["llm/lm_head/w_q"] == P("tp", None)


def test_kv_cache_pspecs_layouts():
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    heads = llm.init_kv_cache(LLAMA_TINY, 4, 32, quant="int8")
    sp = shd.kv_cache_pspecs(heads, tp=4, dp=2)
    assert sp["k"] == P(None, "dp", "tp", None, None)
    assert sp["k_scale"] == P(None, "dp", "tp", None)
    flat = llm.init_kv_cache(LLAMA_TINY, 4, 32, quant="int8", layout="flat")
    sp = shd.kv_cache_pspecs(flat, tp=4, dp=2)
    assert sp["k"] == P(None, "dp", None, "tp")
    assert sp["k_scale"] == P(None, "dp", "tp", None)
    # non-divisible axes drop their sharding instead of erroring
    sp = shd.kv_cache_pspecs(heads, tp=3, dp=3)
    assert sp["k"] == P(None, None, None, None, None)


def test_dp_shard_map_generate_token_identity(setup):
    """dp=8 shard_map path: the COMPLETE single-chip program (incl. the flat
    int8 quantized cache) per device; tokens identical, seg_rows
    re-offset to global rows."""
    tok, cfg, params, images, args = setup
    cfg = cfg.replace(kv_quant_cache="int8_flat")
    B = 8
    rng = np.random.RandomState(1)
    s = cfg.sam.img_size
    images8 = jnp.asarray(rng.randn(B, s, s, 3), jnp.float32)
    ids = np.full((B, 32), 65, np.int64)
    ids[:, 5] = -200
    a = dict(input_ids=jnp.asarray(ids),
             attention_mask=jnp.ones((B, 32), bool),
             row_image_idx=jnp.arange(B, dtype=jnp.int32),
             pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (B, 2)))
    ref = _reference(cfg, tok, params, images8, a, max_segs=32)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    fn = infer.make_dp_generate(mesh, cfg, max_new_tokens=16, max_segs=32,
                                eos_id=tok.eos_token_id)
    out = fn(params, images8, a["input_ids"], a["attention_mask"],
             a["row_image_idx"], a["pixel_hw"])
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))
    # same (row, count) multiset of segs: shard-local extraction reorders
    # the seg slots but every valid seg maps to the same global row
    def seg_multiset(o):
        rows = np.asarray(o.seg_rows)[np.asarray(o.seg_valid).astype(bool)]
        return sorted(rows.tolist())
    assert seg_multiset(ref) == seg_multiset(out)


def test_mesh_config_downgrades_for_tp():
    """tp>1 on a real TPU backend must drop Pallas-only features; on CPU the
    interpret-mode kernels partition, so the config passes through."""
    cfg = tiny_config().replace(kv_quant_cache="int4_flat",
                                use_flash_attention=True)
    out = infer.mesh_config(cfg, tp=8)
    if jax.default_backend() == "cpu":
        assert out.kv_quant_cache == "int4_flat"
    else:                                     # pragma: no cover (TPU CI)
        assert out.kv_quant_cache == "int4"
        assert not out.use_flash_attention


def test_gspmd_generate_speculative_token_identity(setup):
    """Speculative decode under the dp x tp mesh: identical tokens to the
    single-device speculative program (the chunk kernel + while_loop carry
    partition under GSPMD on the interpret backend)."""
    tok, cfg, params, images, args = setup
    cfg = cfg.replace(kv_quant_cache="int8_flat")

    def gen(params, images, input_ids, attention_mask, row_image_idx,
            pixel_hw):
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            pixel_hw=pixel_hw, max_new_tokens=16, max_segs=16,
            eos_id=tok.eos_token_id, speculative_k=4)
    ref = jax.jit(gen)(params, images, **args)
    mesh = shd.make_mesh(dp=2, tp=4)
    sp = infer.shard_params(params, mesh)
    fn = infer.make_sharded_generate(mesh, cfg, max_new_tokens=16,
                                     max_segs=16, eos_id=tok.eos_token_id,
                                     speculative_k=4)
    out = fn(sp, images, args["input_ids"], args["attention_mask"],
             args["row_image_idx"], args["pixel_hw"])
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))


def test_dp_shard_map_generate_speculative(setup):
    """dp shard_map path with speculative decode: the full single-chip
    speculative program (flat int4 cache + chunk kernel) per device."""
    tok, cfg, params, images, args = setup
    cfg = cfg.replace(kv_quant_cache="int4_flat")
    B = 8
    rng = np.random.RandomState(3)
    s = cfg.sam.img_size
    images8 = jnp.asarray(rng.randn(B, s, s, 3), jnp.float32)
    ids = np.full((B, 32), 65, np.int64)
    ids[:, 5] = -200
    a = dict(input_ids=jnp.asarray(ids),
             attention_mask=jnp.ones((B, 32), bool),
             row_image_idx=jnp.arange(B, dtype=jnp.int32),
             pixel_hw=jnp.broadcast_to(jnp.array([[s - s // 4, s]]), (B, 2)))

    def gen(params, images, input_ids, attention_mask, row_image_idx,
            pixel_hw):
        return walkgpt.generate_and_segment(
            params, cfg, images=images, input_ids=input_ids,
            attention_mask=attention_mask, row_image_idx=row_image_idx,
            pixel_hw=pixel_hw, max_new_tokens=16, max_segs=32,
            eos_id=tok.eos_token_id, speculative_k=4)
    ref = jax.jit(gen)(params, images8, **a)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    fn = infer.make_dp_generate(mesh, cfg, max_new_tokens=16, max_segs=32,
                                eos_id=tok.eos_token_id, speculative_k=4)
    out = fn(params, images8, a["input_ids"], a["attention_mask"],
             a["row_image_idx"], a["pixel_hw"])
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(out.tokens))
