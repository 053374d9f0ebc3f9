"""Continuous-batching engine vs wave-based greedy decode: token-identical."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import LLAMA_TINY
from walkgpt_tpu.models import llm
from walkgpt_tpu.runtime.generate import greedy_generate
from walkgpt_tpu.runtime.serving import ContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def reference_decode(params, cfg, ids, max_new):
    arr = jnp.asarray(np.array([ids]))
    res = greedy_generate(params, cfg, llm.embed(params, arr),
                          jnp.ones(arr.shape, bool), max_new_tokens=max_new,
                          eos_id=2, pad_id=0)
    return np.asarray(res.tokens)[0][: int(res.lengths[0])].tolist()


def test_continuous_batcher_token_identical(model):
    cfg, params = model
    rng = np.random.RandomState(0)
    prompts = [rng.randint(3, cfg.vocab_size, rng.randint(3, 10)).tolist()
               for _ in range(7)]
    batcher = ContinuousBatcher(params, cfg, batch_size=3, prompt_len=16,
                                max_new_tokens=12, segment=4)
    finished = batcher.run(iter(prompts))
    assert len(finished) == 7
    by_req = {f.request_id: f.tokens for f in finished}
    assert set(by_req) == set(range(7))
    for rid, prompt in enumerate(prompts):
        ref = reference_decode(params, cfg, prompt, 12)
        assert by_req[rid] == ref, (rid, by_req[rid], ref)


def test_continuous_batcher_fewer_requests_than_slots(model):
    cfg, params = model
    rng = np.random.RandomState(1)
    prompts = [rng.randint(3, cfg.vocab_size, 5).tolist() for _ in range(2)]
    batcher = ContinuousBatcher(params, cfg, batch_size=4, prompt_len=8,
                                max_new_tokens=6, segment=3)
    finished = batcher.run(iter(prompts))
    assert len(finished) == 2
    for f in finished:
        ref = reference_decode(params, cfg, prompts[f.request_id], 6)
        assert f.tokens == ref


def test_continuous_batcher_empty(model):
    cfg, params = model
    batcher = ContinuousBatcher(params, cfg, batch_size=2, prompt_len=8,
                                max_new_tokens=4)
    assert batcher.run(iter([])) == []


def test_batcher_per_request_budgets():
    """Variable answer lengths: each request stops at its own budget and the
    slot is refilled for the next request."""
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.serving import ContinuousBatcher

    params = llm.init(jax.random.PRNGKey(2), LLAMA_TINY)
    batcher = ContinuousBatcher(params, LLAMA_TINY, batch_size=2,
                                prompt_len=16, max_new_tokens=12, segment=4,
                                eos_id=2)
    rng = np.random.RandomState(0)
    prompts = [list(map(int, rng.randint(3, 500, 10))) for _ in range(4)]
    budgets = [3, 12, 5, 7]
    finished = batcher.run(iter(prompts), budgets=budgets)
    assert sorted(f.request_id for f in finished) == [0, 1, 2, 3]
    by_id = {f.request_id: f.tokens for f in finished}
    for rid, budget in enumerate(budgets):
        assert len(by_id[rid]) <= budget


def test_batcher_seg_hidden_matches_wave_decode(model):
    """seg_token_ids mode: the harvested [SEG]-position hidden states match
    GenerateResult.pred_hidden at the same positions (pos-1 predictor
    semantics) for every finished request."""
    cfg, params = model
    rng = np.random.RandomState(3)
    prompts = [rng.randint(3, cfg.vocab_size, size=n).tolist()
               for n in (5, 9, 7)]
    max_new = 12
    seg_ids = tuple(range(3, cfg.vocab_size))   # everything counts as [SEG]

    batcher = ContinuousBatcher(params, cfg, batch_size=2, prompt_len=16,
                                max_new_tokens=max_new, segment=4,
                                seg_token_ids=seg_ids, max_segs_per_answer=8)
    finished = {f.request_id: f for f in batcher.run(iter(prompts))}

    for rid, ids in enumerate(prompts):
        arr = jnp.asarray(np.array([ids]))
        res = greedy_generate(params, cfg, llm.embed(params, arr),
                              jnp.ones(arr.shape, bool),
                              max_new_tokens=max_new, eos_id=2, pad_id=0)
        toks = np.asarray(res.tokens)[0][: int(res.lengths[0])].tolist()
        f = finished[rid]
        assert f.tokens == toks
        seg_pos = [i for i, t in enumerate(f.tokens) if t in seg_ids][:8]
        assert f.seg_hidden is not None
        assert f.seg_hidden.shape[0] == len(seg_pos)
        want = np.asarray(res.pred_hidden)[0][seg_pos]
        np.testing.assert_allclose(f.seg_hidden, want, rtol=2e-4, atol=2e-4)


def test_batcher_drives_full_seg_pipeline():
    """Slot-refill serving end-to-end: spliced visual prompts -> batcher ->
    Finished.seg_hidden -> CTP -> SAM mask decode (model/walkgpt.py:607-746
    as a serving path)."""
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.models import walkgpt, sam
    from walkgpt_tpu.models.projectors import ctp_apply

    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, cfg.sam.img_size, cfg.sam.img_size, 3),
                         jnp.float32)
    feats, sam_tokens = walkgpt.encode_sam(params, cfg, images)
    vis = walkgpt.visual_tokens(params, cfg, sam_tokens)

    from walkgpt_tpu.data.tokenizer import tokenizer_image_token
    ids = np.array([tokenizer_image_token("hi <image> what?", tok)])
    spliced = walkgpt.splice_visual(params, cfg, jnp.asarray(ids), vis[:1])

    batcher = ContinuousBatcher(
        params["llm"], cfg.llm, batch_size=2, prompt_len=64,
        max_new_tokens=8, segment=4, eos_id=tok.eos_token_id,
        seg_token_ids=(st.seg_token_idx,))
    embeds0 = np.asarray(spliced.embeds[0])
    finished = batcher.run(iter([embeds0, embeds0]))
    assert len(finished) == 2
    for f in finished:
        assert f.seg_hidden is not None
        if f.seg_hidden.shape[0] == 0:
            continue
        emb = ctp_apply(params["ctp"][0], jnp.asarray(f.seg_hidden))
        low_res, _ = sam.decode_masks(
            params["sam"], walkgpt.sam_config(cfg),
            jnp.broadcast_to(feats[0], (emb.shape[0],) + feats.shape[1:]),
            text_embeds=emb[:, None], multimask_output=False)
        assert low_res.shape[0] == emb.shape[0]
        assert np.isfinite(np.asarray(low_res)).all()


@pytest.mark.parametrize("kv", ["int8", "int8_flat", "int4_flat"])
def test_continuous_batcher_quantized_pools(model, kv):
    """The slot pool runs the production quantized cache formats (heads int8
    and the flat int8/int4 layouts read by the Pallas banded kernel): tokens
    match the wave decode on the SAME cache format."""
    cfg, params = model
    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, 500, n).tolist() for n in (6, 9, 7)]
    batcher = ContinuousBatcher(params, cfg, batch_size=2, prompt_len=16,
                                max_new_tokens=12, segment=4, eos_id=2,
                                kv_quant=kv)
    fins = {f.request_id: f.tokens for f in batcher.run(prompts)}
    for i, p in enumerate(prompts):
        arr = jnp.asarray(np.array([p]))
        res = greedy_generate(params, cfg, llm.embed(params, arr),
                              jnp.ones(arr.shape, bool), max_new_tokens=12,
                              eos_id=2, pad_id=0, kv_quant=kv)
        ref = np.asarray(res.tokens)[0][: int(res.lengths[0])].tolist()
        assert fins[i] == ref, (kv, i, fins[i], ref)
