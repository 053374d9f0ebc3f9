"""End-to-end tests of the WalkGPT composition on the tiny full-pipeline config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import tiny_config
from walkgpt_tpu.data import conversation as conv_lib
from walkgpt_tpu.data.collate import collate_batch
from walkgpt_tpu.data.pave import PAVESample
from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
from walkgpt_tpu.models import walkgpt
from walkgpt_tpu.runtime.batching import prepare_batch


@pytest.fixture(scope="module")
def setup():
    conv_lib.set_default_conversation("llava_v1")
    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    return tok, st, cfg, params


def make_sample(tok, n_segs=2, h=48, w=64, q="what is here?"):
    answer = ("[assessment] ok [/assessment] Accessible features are here: "
              + "".join(f"[p] thing{i} [/p][SEG]" for i in range(n_segs)))
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], f"<image>\n{q}")
    conv.append_message(conv.roles[1], answer)
    rng = np.random.RandomState(0)
    return PAVESample(
        image_path="/x.png",
        image=rng.randn(64, 64, 3).astype(np.float32),
        image_clip=rng.randn(28, 28, 3).astype(np.float32),
        conversations=[conv.get_prompt()],
        masks=(rng.rand(n_segs, h, w) > 0.5).astype(np.float32),
        label=np.zeros((h, w), np.int32),
        resize=(h, w), clip_resize=(21, 28),
        questions=([q], [1] * n_segs, [["a"]] * n_segs, "cues"),
        sampled_classes=[[str(i)] for i in range(n_segs)],
    )


def test_splice_visual_structure(setup):
    tok, st, cfg, params = setup
    ids = np.array([[1, 50, -200, 60, 61, 2]])
    vis = jnp.array(np.random.RandomState(1).randn(1, cfg.visual_tokens, 64),
                    jnp.float32)
    sp = walkgpt.splice_visual(params, cfg, jnp.array(ids), vis)
    out_len = 6 - 1 + cfg.visual_tokens
    assert sp.embeds.shape == (1, out_len, 64)
    assert int(sp.image_pos[0]) == 2
    # tokens before the image match plain embeddings
    from walkgpt_tpu.models import llm
    emb = llm.embed(params["llm"], jnp.array([[1, 50]]))
    np.testing.assert_allclose(np.asarray(sp.embeds[0, :2]), np.asarray(emb[0]),
                               atol=1e-6)
    # visual block inserted verbatim
    np.testing.assert_allclose(np.asarray(sp.embeds[0, 2:2 + cfg.visual_tokens]),
                               np.asarray(vis[0]), atol=1e-6)
    # trailing tokens follow
    emb_tail = llm.embed(params["llm"], jnp.array([[60, 61, 2]]))
    np.testing.assert_allclose(np.asarray(sp.embeds[0, 2 + cfg.visual_tokens:]),
                               np.asarray(emb_tail[0]), atol=1e-6)
    assert bool(sp.attention_mask.all())


def test_splice_no_image_row(setup):
    tok, st, cfg, params = setup
    ids = np.array([[1, 50, 60, 0, 0]])   # text-only, right-padded
    attn = np.array([[True, True, True, False, False]])
    vis = jnp.zeros((1, cfg.visual_tokens, 64))
    sp = walkgpt.splice_visual(params, cfg, jnp.array(ids), vis,
                               attention_mask=jnp.array(attn))
    # visual block masked off, anchored at the first pad slot so no real
    # token is displaced
    p = int(sp.image_pos[0])
    assert p == 3
    assert not bool(sp.attention_mask[0, p:p + cfg.visual_tokens].any())
    from walkgpt_tpu.models import llm
    emb = llm.embed(params["llm"], jnp.array([[1, 50, 60]]))
    np.testing.assert_allclose(np.asarray(sp.embeds[0, :3]),
                               np.asarray(emb[0]), atol=1e-6)
    assert int(sp.attention_mask[0].sum()) == 3


def test_seg_timeline_mask(setup):
    tok, st, cfg, params = setup
    sid = st.seg_token_idx
    ids = np.array([[1, 10, sid, 11, sid, 2]])
    m = walkgpt.seg_timeline_mask(jnp.array(ids), sid, cfg)
    v = cfg.visual_tokens
    assert m.shape == (1, 6 - 1 + v)
    got = np.where(np.asarray(m[0]))[0].tolist()
    # [SEG] at ids positions 2 and 4 -> mask indices 1 and 3 -> +v-1 offset
    assert got == [(v - 1) + 1, (v - 1) + 3]


def test_model_forward_losses(setup):
    tok, st, cfg, params = setup
    s1 = make_sample(tok, n_segs=2)
    batch = collate_batch([s1], tok)
    db = prepare_batch(batch, img_size=64, seq_multiple=32, seg_multiple=4)
    assert (np.asarray(db.input_ids) == -200).sum() == 1
    fwd = jax.jit(lambda p, im, ii, lb, am, ri, gm, hw: walkgpt.model_forward(
        p, cfg, images=im, input_ids=ii, labels=lb, attention_mask=am,
        row_image_idx=ri, gt_masks=gm, pixel_hw=hw, max_segs=db.max_segs),
        static_argnums=())
    out = fwd(params, jnp.array(db.images), jnp.array(db.input_ids),
              jnp.array(db.labels), jnp.array(db.attention_mask),
              jnp.array(db.row_image_idx), jnp.array(db.gt_masks),
              jnp.array(db.pixel_hw))
    for name in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss", "nce_loss"):
        val = float(getattr(out, name))
        assert np.isfinite(val), name
    assert int(out.seg_valid.sum()) == 2
    assert out.pred_masks.shape == (db.max_segs, 64, 64)


@pytest.mark.slow
def test_model_forward_grad_flows(setup):
    # the backward compile is the expensive half of the old combined test;
    # the default gate keeps fwd+bwd coverage via the sharded train-step
    # tests (test_train_sharded.py), which compile the production program
    tok, st, cfg, params = setup
    s1 = make_sample(tok, n_segs=2)
    batch = collate_batch([s1], tok)
    db = prepare_batch(batch, img_size=64, seq_multiple=32, seg_multiple=4)
    # gradient flows through the full pipeline
    g = jax.grad(lambda p: walkgpt.model_forward(
        p, cfg, images=jnp.array(db.images), input_ids=jnp.array(db.input_ids),
        labels=jnp.array(db.labels), attention_mask=jnp.array(db.attention_mask),
        row_image_idx=jnp.array(db.row_image_idx), gt_masks=jnp.array(db.gt_masks),
        pixel_hw=jnp.array(db.pixel_hw), max_segs=db.max_segs).loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert np.isfinite(total) and total > 0
    # frozen-by-training-policy modules still get grads here (policy applied
    # by the optimizer mask, not the graph)
    ctp_g = sum(float(jnp.abs(l).sum()) for l in
                jax.tree_util.tree_leaves(g["ctp"]))
    assert ctp_g > 0


def test_model_forward_two_images(setup):
    tok, st, cfg, params = setup
    s1 = make_sample(tok, n_segs=1)
    s2 = make_sample(tok, n_segs=2, q="another question?")
    batch = collate_batch([s1, s2], tok)
    db = prepare_batch(batch, img_size=64, seq_multiple=32, seg_multiple=4)
    assert db.row_image_idx.tolist() == [0, 1]
    out = walkgpt.model_forward(
        params, cfg, images=jnp.array(db.images), input_ids=jnp.array(db.input_ids),
        labels=jnp.array(db.labels), attention_mask=jnp.array(db.attention_mask),
        row_image_idx=jnp.array(db.row_image_idx), gt_masks=jnp.array(db.gt_masks),
        pixel_hw=jnp.array(db.pixel_hw), max_segs=db.max_segs)
    assert int(out.seg_valid.sum()) == 3
    assert out.seg_rows[:3].tolist() == [0, 1, 1]
    assert np.isfinite(float(out.loss))


def test_generate_and_segment(setup):
    tok, st, cfg, params = setup
    s1 = make_sample(tok, n_segs=1)
    # generation prompt: question only, no answer
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.messages = []
    conv.append_message(conv.roles[0], "<image>\nwhat?")
    conv.append_message(conv.roles[1], None)
    from walkgpt_tpu.data.tokenizer import tokenizer_image_token
    from walkgpt_tpu.data.conversation import (DEFAULT_IM_START_TOKEN,
                                               DEFAULT_IM_END_TOKEN)
    prompt = conv.get_prompt().replace(
        "<image>", DEFAULT_IM_START_TOKEN + "<image>" + DEFAULT_IM_END_TOKEN)
    ids = np.array([tokenizer_image_token(prompt, tok)])
    out = walkgpt.generate_and_segment(
        params, cfg, images=jnp.array(s1.image[None]),
        input_ids=jnp.array(ids), attention_mask=jnp.ones(ids.shape, bool),
        row_image_idx=jnp.zeros((1,), jnp.int32),
        pixel_hw=jnp.array([[48, 64]]),
        max_new_tokens=8, max_segs=4, eos_id=tok.eos_token_id)
    assert out.tokens.shape == (1, 8)
    assert out.pred_masks.shape == (4, 64, 64)
    # random weights likely produce no [SEG]; the path must still be finite
    assert np.isfinite(np.asarray(out.pred_masks)).all()
    # finalize to original size
    final = walkgpt.finalize_masks(out.pred_masks, (48, 64), (480, 640))
    assert final.shape == (4, 480, 640)


def test_encode_clip_tokens(setup):
    tok, st, cfg, params = setup
    imgs = jnp.array(np.random.RandomState(5).randn(2, 28, 28, 3), jnp.float32)
    toks = walkgpt.encode_clip_tokens(params, cfg, imgs)
    assert toks.shape == (2, 4, cfg.llm.hidden_size)  # 28/14=2 -> 4 patches
    assert jnp.isfinite(toks).all()


def test_splice_visual_multi(setup):
    tok, st, cfg, params = setup
    import numpy as np
    v = cfg.visual_tokens
    # row 0: two images; row 1: one image (second block masked off)
    ids = np.array([[1, 10, -200, 11, -200, 12],
                    [1, 20, -200, 21, 22, 0]])
    attn = np.array([[True] * 6, [True] * 5 + [False]])
    rng = np.random.RandomState(0)
    vis = jnp.array(rng.randn(2, 2, v, 64), jnp.float32)
    sp = walkgpt.splice_visual_multi(params, cfg, jnp.array(ids), vis,
                                     attention_mask=jnp.array(attn))
    out_len = 6 - 1 + v - 1 + v
    assert sp.embeds.shape == (2, out_len, 64)
    from walkgpt_tpu.models import llm as llm_mod
    # row 0: [1,10] [vis0] [11] [vis1] [12]
    np.testing.assert_allclose(np.asarray(sp.embeds[0, 2:2 + v]),
                               np.asarray(vis[0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.embeds[0, 3 + v:3 + 2 * v]),
                               np.asarray(vis[0, 1]), atol=1e-6)
    tok11 = llm_mod.embed(params["llm"], jnp.array([[11]]))[0, 0]
    np.testing.assert_allclose(np.asarray(sp.embeds[0, 2 + v]),
                               np.asarray(tok11), atol=1e-6)
    assert bool(sp.attention_mask[0].all())
    # row 1: first block real, second appended masked-off
    assert bool(sp.attention_mask[1, 2:2 + v].all())
    n_attended = int(sp.attention_mask[1].sum())
    assert n_attended == 5 - 1 + v   # 5 real tokens -1 sentinel + v visual


def test_generate_and_segment_speculative_matches_wave(setup):
    """speculative_k decode through the full pipeline: tokens, SEG packing,
    and masks identical to the wave decoder."""
    tok, st, cfg, params = setup
    s = make_sample(tok)
    from walkgpt_tpu.data.collate import collate_batch
    b = collate_batch([s], tok)
    db = prepare_batch(b, img_size=cfg.sam.img_size, seq_multiple=64,
                       max_segs=8, seg_token_id=st.seg_token_idx)
    from walkgpt_tpu.data.tokenizer import tokenizer_image_token
    ids = np.array([tokenizer_image_token(
        "what do you see? <image> answer:", tok)])
    kw = dict(images=jnp.asarray(db.images), input_ids=jnp.asarray(ids),
              attention_mask=jnp.ones(ids.shape, bool),
              row_image_idx=jnp.zeros((1,), jnp.int32),
              pixel_hw=jnp.asarray(db.pixel_hw), max_new_tokens=12,
              max_segs=8, eos_id=tok.eos_token_id)
    wave = walkgpt.generate_and_segment(params, cfg, **kw)
    spec = walkgpt.generate_and_segment(params, cfg, speculative_k=4, **kw)
    np.testing.assert_array_equal(np.asarray(wave.tokens),
                                  np.asarray(spec.tokens))
    np.testing.assert_array_equal(np.asarray(wave.seg_valid),
                                  np.asarray(spec.seg_valid))
    np.testing.assert_allclose(np.asarray(wave.pred_masks, np.float32),
                               np.asarray(spec.pred_masks, np.float32),
                               rtol=2e-3, atol=2e-3)
