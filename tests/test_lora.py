"""Fresh-LoRA training injection (reference train_walkgpt.py:263-305:
get_peft_model(LoraConfig(r, alpha, target_modules, bias="none")) over
q_proj/v_proj, excluding every vision/seg module)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import LLMConfig, tiny_config
from walkgpt_tpu.models import llm
from walkgpt_tpu.runtime import checkpoint as ck
from walkgpt_tpu.runtime import train as tr

TINY = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                 num_layers=2, num_heads=4, num_kv_heads=4)


@pytest.fixture(scope="module")
def base():
    return llm.init(jax.random.PRNGKey(0), TINY)


def _fwd(params, ids):
    emb = llm.embed(params, ids)
    h, _ = llm.forward(params, TINY, emb)
    return llm.lm_logits(params, TINY, h)


def test_init_lora_is_identity_at_init(base):
    """peft init: B = 0, so the adapted model equals the base exactly."""
    adapted = ck.init_lora(base, jax.random.PRNGKey(1), r=4,
                           targets=("q_proj", "v_proj"))
    ids = jnp.array([[1, 5, 9, 3]])
    np.testing.assert_allclose(np.asarray(_fwd(base, ids)),
                               np.asarray(_fwd(adapted, ids)), rtol=1e-6)
    # adapters exist exactly on q and v, nowhere else
    for layer in adapted["layers"]:
        assert "lora_a" in layer["attn"]["q"]
        assert "lora_a" in layer["attn"]["v"]
        assert "lora_a" not in layer["attn"]["k"]
        assert "lora_a" not in layer["attn"]["o"]
        a = layer["attn"]["q"]["lora_a"]
        b = layer["attn"]["q"]["lora_b"]
        assert a.shape == (32, 4) and b.shape == (4, 32)
        assert float(jnp.abs(b).max()) == 0.0
        assert float(layer["attn"]["q"]["lora_scale"]) == pytest.approx(16 / 4)


def test_init_lora_rejects_unknown_target(base):
    with pytest.raises(ValueError, match="unsupported lora target"):
        ck.init_lora(base, jax.random.PRNGKey(1), targets=("up_proj",))


def test_merge_matches_adapter_forward(base):
    """After perturbing B (simulating training), merged weights reproduce the
    adapter forward exactly — the merge_and_unload contract."""
    adapted = ck.init_lora(base, jax.random.PRNGKey(1), r=4, alpha=8.0)
    key = jax.random.PRNGKey(2)
    for layer in adapted["layers"]:
        for name in ("q", "v"):
            key, k = jax.random.split(key)
            layer["attn"][name]["lora_b"] = 0.1 * jax.random.normal(
                k, layer["attn"][name]["lora_b"].shape)
    merged = ck.merge_lora(adapted)
    ids = jnp.array([[7, 2, 11, 4, 1]])
    np.testing.assert_allclose(np.asarray(_fwd(adapted, ids)),
                               np.asarray(_fwd(merged, ids)),
                               rtol=2e-5, atol=2e-5)
    for layer in merged["layers"]:
        assert "lora_a" not in layer["attn"]["q"]


def test_adapter_tree_roundtrip(base):
    """extract (lora_adapter_tree) -> overlay (load_into) roundtrips onto a
    fresh base: the adapter-only checkpoint contract."""
    adapted = ck.init_lora(base, jax.random.PRNGKey(1), r=4)
    adapted["layers"][0]["attn"]["q"]["lora_b"] = jnp.ones((4, 32)) * 0.01
    overlay = ck.lora_adapter_tree(adapted)
    assert set(overlay["layers"][0]["attn"]) == {"q", "v"}
    assert set(overlay["layers"][0]["attn"]["q"]) == {
        "lora_a", "lora_b", "lora_scale"}
    reattached = ck.load_into({"llm": base}, {"llm": overlay})["llm"]
    ids = jnp.array([[3, 1, 4, 1, 5]])
    np.testing.assert_allclose(np.asarray(_fwd(adapted, ids)),
                               np.asarray(_fwd(reattached, ids)), rtol=1e-6)


def test_trainable_set_matches_reference():
    """A train step on the full tiny model updates ONLY: LoRA adapters,
    embed_tokens, lm_head, SAM mask decoder, CTP, MSQP/mm projectors
    (reference requires_grad policy, train_walkgpt.py:263-359)."""
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.models import walkgpt

    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    params["llm"] = ck.init_lora(params["llm"], jax.random.PRNGKey(1), r=2)

    tcfg = tr.TrainConfig(lr=1e-2, warmup_steps=1, total_steps=10)
    mask = tr.trainable_mask(params, tcfg)

    flat = dict(jax.tree_util.tree_leaves_with_path(mask))
    trained = {tr.shd._path_str(p) for p, m in
               jax.tree_util.tree_leaves_with_path(mask) if m}
    assert any("lora_a" in p for p in trained)
    assert any(p.startswith("llm/embed_tokens") for p in trained)
    assert any(p.startswith("sam/mask_decoder") for p in trained)
    assert any(p.startswith("ctp/") for p in trained)
    assert any(p.startswith("msqp/") for p in trained)
    # frozen: base LLM projections, SAM encoder, lora_scale
    for p, m in jax.tree_util.tree_leaves_with_path(mask):
        ps = tr.shd._path_str(p)
        if ("attn" in ps and not ("lora_a" in ps or "lora_b" in ps)
                and ps.startswith("llm/")):
            assert not m, ps
        if "lora_scale" in ps:
            assert not m, ps
        if ps.startswith("sam/encoder"):
            assert not m, ps

    # one real step: frozen leaves bit-identical, adapters move
    from test_walkgpt_model import make_sample
    from walkgpt_tpu.data.collate import collate_batch
    from walkgpt_tpu.runtime.batching import prepare_batch
    from walkgpt_tpu.data import conversation as conv_lib
    conv_lib.set_default_conversation("llava_v1")
    s = make_sample(tok)
    b = collate_batch([s], tok)
    db = prepare_batch(b, img_size=cfg.sam.img_size, seq_multiple=64,
                       max_segs=4, seg_token_id=st.seg_token_idx)
    batch = {
        "images": jnp.asarray(db.images),
        "input_ids": jnp.asarray(db.input_ids),
        "labels": jnp.asarray(db.labels),
        "attention_mask": jnp.asarray(db.attention_mask),
        "row_image_idx": jnp.asarray(db.row_image_idx),
        "gt_masks": jnp.asarray(db.gt_masks),
        "pixel_hw": jnp.asarray(db.pixel_hw),
    }
    state, opt = tr.init_state(params, tcfg)
    step = jax.jit(lambda s, b: tr.train_step(s, b, opt=opt, model_cfg=cfg,
                                              max_segs=4))
    # two steps: WarmupDecayLR is 0 at step 0, so movement shows from step 2
    new_state, metrics = step(state, batch)
    new_state, metrics = step(new_state, batch)
    assert np.isfinite(float(metrics["loss"]))

    before = jax.tree_util.tree_leaves_with_path(params)
    after = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    moved = []
    for p, old in before:
        ps = tr.shd._path_str(p)
        new = after[p]
        if not hasattr(old, "shape"):
            continue
        same = bool(jnp.all(old == new))
        is_trainable = flat[p]
        if not same:
            moved.append(ps)
            assert is_trainable, f"frozen leaf moved: {ps}"
    assert any("lora_b" in p for p in moved), moved
    assert any(p.startswith("llm/embed_tokens") for p in moved)
    # base LLM q/v weights did NOT move (msqp's own attn blocks may — trained)
    assert not any(ps.startswith("llm/") and ps.endswith("attn/q/w")
                   for ps in moved)
