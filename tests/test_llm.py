import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import LLMConfig, LLAMA_TINY
from walkgpt_tpu.models import llm
from walkgpt_tpu.runtime.generate import greedy_generate

MPT_TINY = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                     num_layers=2, num_heads=4, num_kv_heads=4, pos_emb="alibi",
                     norm="layernorm", act="gelu", tie_embeddings=True,
                     family="mpt")
STABLELM_TINY = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          rope_pct=0.5, norm="layernorm", family="stablelm")


@pytest.mark.parametrize("cfg", [LLAMA_TINY, MPT_TINY, STABLELM_TINY],
                         ids=["llama", "mpt", "stablelm"])
def test_forward_shapes(cfg):
    params = llm.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.array(np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 9)))
    x = llm.embed(params, ids)
    hidden, _ = llm.forward(params, cfg, x)
    assert hidden.shape == (2, 9, cfg.hidden_size)
    logits = llm.lm_logits(params, cfg, hidden)
    assert logits.shape == (2, 9, cfg.vocab_size)
    assert jnp.isfinite(logits).all()


def test_causality():
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(1), cfg)
    ids = jnp.array([[5, 6, 7, 8, 9]])
    h1, _ = llm.forward(params, cfg, llm.embed(params, ids))
    ids2 = ids.at[0, 4].set(11)
    h2, _ = llm.forward(params, cfg, llm.embed(params, ids2))
    np.testing.assert_allclose(np.asarray(h1[0, :4]), np.asarray(h2[0, :4]),
                               atol=1e-5)
    assert float(jnp.abs(h1[0, 4] - h2[0, 4]).max()) > 1e-6


def test_rope_properties():
    cfg = LLAMA_TINY
    x = jnp.array(np.random.RandomState(2).randn(1, 2, 3, 16), jnp.float32)
    cos, sin = llm.rope_tables(cfg, jnp.zeros((1, 3), jnp.int32))
    out0 = llm.apply_rope(x, cos, sin, 16)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-6)
    cos, sin = llm.rope_tables(cfg, jnp.array([[0, 1, 2]], jnp.int32))
    out = llm.apply_rope(x, cos, sin, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_partial_rope_keeps_pass_dims():
    x = jnp.array(np.random.RandomState(3).randn(1, 1, 2, 8), jnp.float32)
    cos, sin = llm.rope_tables(
        LLMConfig(hidden_size=32, num_heads=4, rope_pct=0.5),
        jnp.array([[3, 4]], jnp.int32))
    out = llm.apply_rope(x, cos, sin, 4)
    np.testing.assert_array_equal(np.asarray(out[..., 4:]), np.asarray(x[..., 4:]))


def test_alibi_slopes_powers_of_two():
    s = np.asarray(llm.alibi_slopes(8))
    np.testing.assert_allclose(s, [2 ** (-i) for i in range(1, 9)], rtol=1e-6)
    s12 = np.asarray(llm.alibi_slopes(12))
    assert len(s12) == 12 and (s12 > 0).all()


@pytest.mark.parametrize("cfg", [LLAMA_TINY, MPT_TINY, STABLELM_TINY],
                         ids=["llama", "mpt", "stablelm"])
def test_greedy_generate_matches_naive_recompute(cfg):
    """KV-cache decode must produce exactly the tokens of full re-forward
    greedy decoding (token-identical requirement, BASELINE.json)."""
    params = llm.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(4)
    prompt = jnp.array(rng.randint(3, cfg.vocab_size, (2, 6)))
    mask = jnp.ones((2, 6), bool)
    res = greedy_generate(params, cfg, llm.embed(params, prompt), mask,
                          max_new_tokens=8, eos_id=2, pad_id=0)

    # naive: re-run the full forward each step
    seqs = np.asarray(prompt)
    naive = [[], []]
    done = [False, False]
    cur = seqs.copy()
    for _ in range(8):
        h, _ = llm.forward(params, cfg, llm.embed(params, jnp.array(cur)))
        logits = llm.lm_logits(params, cfg, h)[:, -1].astype(jnp.float32)
        nxt = np.asarray(jnp.argmax(logits, -1))
        for b in range(2):
            if not done[b]:
                naive[b].append(int(nxt[b]))
                if nxt[b] == 2:
                    done[b] = True
        cur = np.concatenate([cur, nxt[:, None]], axis=1)

    got = np.asarray(res.tokens)
    for b in range(2):
        want = naive[b] + [0] * (8 - len(naive[b]))
        assert got[b].tolist() == want, (b, got[b].tolist(), want)


def test_greedy_generate_padded_rows_match_unpadded():
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(5)
    p1 = rng.randint(3, cfg.vocab_size, (1, 4))
    p2 = rng.randint(3, cfg.vocab_size, (1, 7))
    # batch with right padding
    batch = np.zeros((2, 7), np.int64)
    batch[0, :4] = p1[0]
    batch[1] = p2[0]
    mask = np.zeros((2, 7), bool)
    mask[0, :4] = True
    mask[1] = True
    res_b = greedy_generate(params, cfg, llm.embed(params, jnp.array(batch)),
                            jnp.array(mask), max_new_tokens=5, eos_id=2)
    res_1 = greedy_generate(params, cfg, llm.embed(params, jnp.array(p1)),
                            jnp.ones((1, 4), bool), max_new_tokens=5, eos_id=2)
    res_2 = greedy_generate(params, cfg, llm.embed(params, jnp.array(p2)),
                            jnp.ones((1, 7), bool), max_new_tokens=5, eos_id=2)
    assert np.asarray(res_b.tokens)[0].tolist() == np.asarray(res_1.tokens)[0].tolist()
    assert np.asarray(res_b.tokens)[1].tolist() == np.asarray(res_2.tokens)[0].tolist()


def test_pred_hidden_alignment():
    """pred_hidden[:, t] must be the state that predicted tokens[:, t]:
    argmax(lm_head(pred_hidden[t])) == tokens[t] for live rows."""
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(6), cfg)
    prompt = jnp.array(np.random.RandomState(6).randint(3, cfg.vocab_size, (1, 5)))
    res = greedy_generate(params, cfg, llm.embed(params, prompt),
                          jnp.ones((1, 5), bool), max_new_tokens=6, eos_id=2)
    toks = np.asarray(res.tokens)[0]
    n = int(res.lengths[0])
    logits = llm.lm_logits(params, cfg, res.pred_hidden[0]).astype(jnp.float32)
    pred = np.asarray(jnp.argmax(logits, -1))
    assert (pred[:n] == toks[:n]).all()


def test_lora_projection_path():
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(7), cfg)
    ids = jnp.array([[4, 5, 6]])
    base, _ = llm.forward(params, cfg, llm.embed(params, ids))
    # add a LoRA delta on layer-0 q projection
    import copy
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    q = dict(p2["layers"][0]["attn"])
    q["q"] = dict(q["q"],
                  lora_a=0.1 * jnp.ones((cfg.hidden_size, 2)),
                  lora_b=0.1 * jnp.ones((2, cfg.hidden_size)),
                  lora_scale=2.0)
    p2["layers"][0] = dict(p2["layers"][0], attn=q)
    out, _ = llm.forward(p2, cfg, llm.embed(p2, ids))
    assert float(jnp.abs(out - base).max()) > 1e-6


def test_int8_weight_only_quantization():
    """Quantized decode stays close to bf16 and produces identical greedy
    tokens for a confident random model at small scale."""
    from walkgpt_tpu.ops.quant import quantize_llm, quantize_weight, \
        quantized_linear
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(8), cfg)
    qparams = quantize_llm(params)
    assert "w_q" in qparams["layers"][0]["attn"]["q"]
    assert qparams["layers"][0]["attn"]["q"]["w_q"].dtype == jnp.int8
    ids = jnp.array(np.random.RandomState(8).randint(3, cfg.vocab_size, (1, 8)))
    h, _ = llm.forward(params, cfg, llm.embed(params, ids))
    hq, _ = llm.forward(qparams, cfg, llm.embed(qparams, ids))
    rel = float(jnp.linalg.norm(h - hq) / jnp.linalg.norm(h))
    assert rel < 0.05, rel
    # single-weight numerics
    w = jnp.array(np.random.RandomState(9).randn(16, 8), jnp.float32)
    q = quantize_weight(w)
    x = jnp.array(np.random.RandomState(10).randn(2, 16), jnp.float32)
    err = float(jnp.abs(quantized_linear(q, x) - x @ w).max())
    assert err < 0.2


def test_int8_kv_cache_decode_close():
    """int8 KV cache: decode hidden states stay within quantization noise of
    the fp cache path, and greedy_generate runs end-to-end with it."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import greedy_generate

    params = llm.init(jax.random.PRNGKey(3), LLAMA_TINY)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(3, 500, (2, 12)))
    mask = jnp.ones((2, 12), bool)
    x = llm.embed(params, ids)

    res_fp = greedy_generate(params, LLAMA_TINY, x, mask, max_new_tokens=8,
                             eos_id=2, kv_quant=False)
    res_q = greedy_generate(params, LLAMA_TINY, x, mask, max_new_tokens=8,
                            eos_id=2, kv_quant=True)
    assert res_q.tokens.shape == res_fp.tokens.shape
    # prefill hidden (pre-cache) identical; decode hiddens within int8 noise
    np.testing.assert_allclose(np.asarray(res_q.prefill_hidden),
                               np.asarray(res_fp.prefill_hidden),
                               rtol=1e-5, atol=1e-5)
    a = np.asarray(res_q.pred_hidden, np.float32)
    b = np.asarray(res_fp.pred_hidden, np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 0.05, rel


def test_prefill_cache_matches_decode_reconstruction():
    """Prefill in-place cache writes: decoding from the prefilled cache must
    match a full forward over prompt+token (regression for the cache-write
    path rework)."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm

    params = llm.init(jax.random.PRNGKey(4), LLAMA_TINY)
    rng = np.random.RandomState(6)
    ids = jnp.asarray(rng.randint(3, 500, (1, 9)))
    x = llm.embed(params, ids)
    cache = llm.init_kv_cache(LLAMA_TINY, 1, 16)
    _, cache = llm.forward(params, LLAMA_TINY, x, kv_cache=cache)

    nxt = jnp.asarray(rng.randint(3, 500, (1, 1)))
    xe = llm.embed(params, nxt)
    key_mask = jnp.arange(16)[None] <= 9
    hid_step, _ = llm.decode_step(params, LLAMA_TINY, cache, xe,
                                  jnp.array([9]), key_mask)

    full_ids = jnp.concatenate([ids, nxt], axis=1)
    hid_full, _ = llm.forward(params, LLAMA_TINY, llm.embed(params, full_ids))
    np.testing.assert_allclose(np.asarray(hid_step[:, 0]),
                               np.asarray(hid_full[:, -1]),
                               rtol=2e-4, atol=2e-5)


def test_prefix_lm_mask():
    """MPT prefix-LM capability (reference mpt/hf_prefixlm_converter.py): with
    prefix_mask, prefix tokens attend bidirectionally; suffix stays causal.
    Check by equivalence to an explicit-mask mha forward and by the
    information-flow property: a perturbation at the LAST prefix token changes
    the FIRST prefix token's hidden state (impossible under pure causal)."""
    import numpy as np
    from walkgpt_tpu.core.config import MPT_7B
    import dataclasses
    cfg = dataclasses.replace(MPT_7B, vocab_size=512, hidden_size=64,
                              intermediate_size=128, num_layers=2,
                              num_heads=4, num_kv_heads=4)
    from walkgpt_tpu.models import llm
    params = llm.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(9)
    ids = jnp.asarray(rng.randint(3, 500, (1, 10)))
    x = llm.embed(params, ids)
    prefix = jnp.asarray(np.arange(10)[None] < 4)

    h_causal, _ = llm.forward(params, cfg, x)
    h_prefix, _ = llm.forward(params, cfg, x, prefix_mask=prefix)
    # suffix-only perturbation cannot reach the prefix in either mode
    assert not np.allclose(np.asarray(h_causal[0, 0]),
                           np.asarray(h_prefix[0, 0]))

    ids2 = np.asarray(ids).copy()
    ids2[0, 3] = (ids2[0, 3] + 1) % 500 + 3       # perturb last prefix token
    x2 = llm.embed(params, jnp.asarray(ids2))
    h2_causal, _ = llm.forward(params, cfg, x2)
    h2_prefix, _ = llm.forward(params, cfg, x2, prefix_mask=prefix)
    # causal: token 0 cannot see token 3
    np.testing.assert_allclose(np.asarray(h_causal[0, 0]),
                               np.asarray(h2_causal[0, 0]), rtol=1e-6)
    # prefix-LM: it can
    assert not np.allclose(np.asarray(h_prefix[0, 0]),
                           np.asarray(h2_prefix[0, 0]))


def test_int4_kv_cache_decode_close():
    """int4 KV cache: teacher-forced decode hiddens stay within 4-bit noise
    of the fp cache path (greedy comparisons are invalid — one flipped token
    diverges the whole trajectory). The int4 buffers live entirely inside
    jit programs."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(3, 500, (2, 12)))
    mask = jnp.ones((2, 12), bool)
    x = llm.embed(params, ids)
    max_len = 16

    def run(quant):
        cache = llm.init_kv_cache(cfg, 2, max_len, dtype=jnp.float32,
                                  quant=quant)
        _, cache = llm.forward(params, cfg, x, attention_mask=mask,
                               kv_cache=cache)
        hs = []
        clen = jnp.full((2,), 12, jnp.int32)
        key_pos = jnp.arange(max_len)[None]
        for step_tok in (7, 11, 13):
            emb = llm.embed(params, jnp.full((2,), step_tok, jnp.int32))
            h, cache = llm.decode_step(params, cfg, cache, emb[:, None],
                                       clen, key_pos <= clen[:, None])
            hs.append(np.asarray(h[:, 0], np.float32))
            clen = clen + 1
        return np.stack(hs)

    b = run(False)
    errs = {}
    for quant in ("int8", "int4"):
        a = run(quant)
        errs[quant] = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert errs["int4"] < 0.25, errs
    assert errs["int8"] < errs["int4"]    # int8 strictly tighter


def test_sam_encoder_int8_and_chunked_encode():
    """quantize_sam_encoder keeps the encoder close to bf16, and
    sam_encode_chunk splits the batch without changing results."""
    import numpy as np
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.ops.quant import quantize_sam_encoder

    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(
        2, cfg.sam.img_size, cfg.sam.img_size, 3), jnp.float32)

    feats, toks = walkgpt.encode_sam(params, cfg, imgs)
    cfg_c = cfg.replace(sam_encode_chunk=1)
    feats_c, _ = walkgpt.encode_sam(params, cfg_c, imgs)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_c),
                               rtol=2e-5, atol=2e-5)

    qparams = dict(params, sam=quantize_sam_encoder(params["sam"]))
    feats_q, _ = walkgpt.encode_sam(qparams, cfg, imgs)
    a, b = np.asarray(feats_q, np.float32), np.asarray(feats, np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 0.1, rel


def test_speculative_generate_token_identical():
    """Prompt-lookup speculative decode is token-identical to greedy
    (the invariant holds at ANY draft acceptance rate) and returns the same
    predictor hidden states for [SEG]-style extraction."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import (greedy_generate,
                                              speculative_generate)

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(11)
    # repetitive prompt -> real lookup hits; plus a ragged row
    base = [5, 9, 14, 5, 9, 14, 5, 9, 14, 5, 9]
    ids = np.stack([base, rng.randint(3, 500, len(base))]).astype(np.int64)
    mask = np.ones_like(ids, bool)
    mask[1, -2:] = False
    ids_j = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)
    x = llm.embed(params, ids_j)

    res_g = greedy_generate(params, cfg, x, mask_j, max_new_tokens=16,
                            eos_id=2, pad_id=0)
    for kwargs in ({"prompt_ids": jnp.asarray(np.where(mask, ids, -1))},
                   {}, {"draft_k": 3, "ngram": 2,
                        "prompt_ids": ids_j}):
        res_s = speculative_generate(params, cfg, x, mask_j,
                                     max_new_tokens=16, eos_id=2, pad_id=0,
                                     **kwargs)
        np.testing.assert_array_equal(np.asarray(res_s.tokens),
                                      np.asarray(res_g.tokens))
        np.testing.assert_array_equal(np.asarray(res_s.lengths),
                                      np.asarray(res_g.lengths))
        a = np.asarray(res_s.pred_hidden, np.float32)
        g = np.asarray(res_g.pred_hidden, np.float32)
        # compare only emitted positions (padding hiddens differ by design)
        for b in range(ids.shape[0]):
            n = int(res_g.lengths[b])
            np.testing.assert_allclose(a[b, :n], g[b, :n],
                                       rtol=2e-4, atol=2e-4)


def test_speculative_generate_eos_and_budget():
    """EOS inside an accepted run stops the row exactly like greedy; a
    restricted vocabulary makes EOS certain within the budget."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import (greedy_generate,
                                              speculative_generate)

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(9), cfg)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(3, 500, (3, 7)))
    mask = jnp.ones((3, 7), bool)
    x = llm.embed(params, ids)
    lm = np.zeros((cfg.vocab_size,), bool)
    lm[[2, 3, 4]] = True                      # eos + two tokens only
    lm_j = jnp.asarray(lm)
    res_g = greedy_generate(params, cfg, x, mask, max_new_tokens=12,
                            eos_id=2, pad_id=0, logits_mask=lm_j)
    res_s = speculative_generate(params, cfg, x, mask, max_new_tokens=12,
                                 eos_id=2, pad_id=0, logits_mask=lm_j,
                                 prompt_ids=ids, draft_k=4)
    np.testing.assert_array_equal(np.asarray(res_s.tokens),
                                  np.asarray(res_g.tokens))
    np.testing.assert_array_equal(np.asarray(res_s.lengths),
                                  np.asarray(res_g.lengths))


def test_chunked_prefill_matches_full():
    """prefill_chunk changes only the schedule: tokens and hiddens identical
    to full-batch prefill (fp path and int8 cache path)."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import greedy_generate

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(12), cfg)
    rng = np.random.RandomState(12)
    ids = jnp.asarray(rng.randint(3, 500, (4, 9)))
    mask = jnp.asarray(rng.rand(4, 9) > 0.1)
    mask = mask.at[:, 0].set(True)
    x = llm.embed(params, ids)
    for kv in ("", "int8"):
        full = greedy_generate(params, cfg, x, mask, max_new_tokens=6,
                               eos_id=2, kv_quant=kv)
        chunked = greedy_generate(params, cfg, x, mask, max_new_tokens=6,
                                  eos_id=2, kv_quant=kv, prefill_chunk=2)
        np.testing.assert_array_equal(np.asarray(full.tokens),
                                      np.asarray(chunked.tokens))
        np.testing.assert_allclose(np.asarray(full.prefill_hidden, np.float32),
                                   np.asarray(chunked.prefill_hidden,
                                              np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_int8_flat_cache_matches_heads_layout(monkeypatch):
    """kv_quant='int8_flat' (flat rows + the fused Pallas decode-attention
    kernel with in-VMEM dequant) produces the same decode trajectory as the
    heads-layout int8 cache, for MHA and GQA configs — both paths quantize
    on the identical per-(token, kv-head) grid. Exact equality holds with
    the bf16 scores dot; the default int8-MXU scores dot (DECODE_QDOT8)
    additionally quantizes q per head, so it is checked to TRACK the heads
    trajectory rather than equal it."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY, LLMConfig
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.ops import flash_attention as fa
    from walkgpt_tpu.runtime.generate import greedy_generate

    gqa = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2)
    for cfg in (LLAMA_TINY, gqa):
        params = llm.init(jax.random.PRNGKey(13), cfg)
        rng = np.random.RandomState(13)
        ids = jnp.asarray(rng.randint(3, cfg.vocab_size, (2, 10)))
        mask = jnp.ones((2, 10), bool)
        x = llm.embed(params, ids)
        heads = greedy_generate(params, cfg, x, mask, max_new_tokens=8,
                                eos_id=2, kv_quant="int8")
        monkeypatch.setattr(fa, "DECODE_QDOT8", False)
        flat = greedy_generate(params, cfg, x, mask, max_new_tokens=8,
                               eos_id=2, kv_quant="int8_flat")
        np.testing.assert_array_equal(np.asarray(heads.tokens),
                                      np.asarray(flat.tokens))
        a = np.asarray(flat.pred_hidden, np.float32)
        b = np.asarray(heads.pred_hidden, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        # same quant grid; the kernel's bf16 dequant dots + online softmax
        # reassociate vs the heads path's full-row f32 softmax
        assert rel < 5e-3, rel
        monkeypatch.setattr(fa, "DECODE_QDOT8", True)
        flat8 = greedy_generate(params, cfg, x, mask, max_new_tokens=8,
                                eos_id=2, kv_quant="int8_flat")
        a8 = np.asarray(flat8.pred_hidden, np.float32)
        rel8 = np.abs(a8[:, 0] - b[:, 0]).max() / (np.abs(b[:, 0]).max()
                                                   + 1e-9)
        assert rel8 < 2e-2, rel8
        assert np.isfinite(a8).all()


def test_int4_flat_cache_decodes_close_to_fp():
    """kv_quant='int4_flat' (nibble-packed flat cache, in-kernel unpack)
    tracks the full-precision decode closely on a well-conditioned model —
    int4 KV is lossy, so this checks trajectory fidelity, not bit equality."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY, LLMConfig
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import greedy_generate

    gqa = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2)
    for cfg in (LLAMA_TINY, gqa):
        params = llm.init(jax.random.PRNGKey(7), cfg)
        rng = np.random.RandomState(7)
        ids = jnp.asarray(rng.randint(3, cfg.vocab_size, (2, 10)))
        mask = jnp.ones((2, 10), bool)
        x = llm.embed(params, ids)
        fp = greedy_generate(params, cfg, x, mask, max_new_tokens=6,
                             eos_id=2)
        q4 = greedy_generate(params, cfg, x, mask, max_new_tokens=6,
                             eos_id=2, kv_quant="int4_flat")
        a = np.asarray(q4.pred_hidden, np.float32)
        b = np.asarray(fp.pred_hidden, np.float32)
        # int4 KV error compounds over steps; bound the FIRST-step hidden
        # tightly (pure attention error) and the rest loosely
        rel0 = np.abs(a[:, 0] - b[:, 0]).max() / (np.abs(b[:, 0]).max() + 1e-9)
        assert rel0 < 0.15, rel0
        assert np.isfinite(a).all()


@pytest.mark.slow  # decode_cache_grow is OFF in every production config
# (measured regression, see bench.py); parity kept for full runs
def test_growing_cache_decode_token_identical():
    """cache_grow_step segments the decode scan with a growing cache; tokens,
    hidden states, and lengths must match the single-allocation path exactly
    (the masked tail only ever contributed -inf scores). Covers padded rows,
    EOS stopping, quantized caches, and a non-divisible tail segment."""
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(21), cfg)
    rng = np.random.RandomState(21)
    batch = np.zeros((2, 7), np.int64)
    batch[0, :4] = rng.randint(3, cfg.vocab_size, 4)
    batch[1] = rng.randint(3, cfg.vocab_size, 7)
    mask = np.zeros((2, 7), bool)
    mask[0, :4] = True
    mask[1] = True
    x = llm.embed(params, jnp.asarray(batch))
    for kvq in ("", "int8"):
        base = greedy_generate(params, cfg, x, jnp.asarray(mask),
                               max_new_tokens=11, eos_id=2, kv_quant=kvq)
        for grow in (4, 5, 11, 64):
            seg = greedy_generate(params, cfg, x, jnp.asarray(mask),
                                  max_new_tokens=11, eos_id=2, kv_quant=kvq,
                                  cache_grow_step=grow)
            np.testing.assert_array_equal(np.asarray(base.tokens),
                                          np.asarray(seg.tokens), err_msg=f"{kvq}/{grow}")
            np.testing.assert_array_equal(np.asarray(base.lengths),
                                          np.asarray(seg.lengths))
            # hidden states agree up to dot-reduction reassociation over the
            # (shorter) cache length; int8 dequant amplifies it slightly
            np.testing.assert_allclose(np.asarray(seg.pred_hidden, np.float32),
                                       np.asarray(base.pred_hidden, np.float32),
                                       atol=1e-3 if kvq else 1e-5)


def test_scan_segment_split_token_identical():
    """scan_segment caps decode scan trip counts (the v5e while-loop
    double-buffering cliff workaround, runtime/generate.greedy_generate):
    every segment reads/writes the SAME full-length cache, so tokens,
    lengths, and hidden states must match the single-scan path bitwise."""
    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(23), cfg)
    rng = np.random.RandomState(23)
    batch = np.zeros((2, 6), np.int64)
    batch[0, :3] = rng.randint(3, cfg.vocab_size, 3)
    batch[1] = rng.randint(3, cfg.vocab_size, 6)
    mask = np.zeros((2, 6), bool)
    mask[0, :3] = True
    mask[1] = True
    x = llm.embed(params, jnp.asarray(batch))
    for kvq in ("", "int8"):
        base = greedy_generate(params, cfg, x, jnp.asarray(mask),
                               max_new_tokens=10, eos_id=2, kv_quant=kvq,
                               scan_segment=0)
        for seg_len in (3, 4, 10, 256):
            seg = greedy_generate(params, cfg, x, jnp.asarray(mask),
                                  max_new_tokens=10, eos_id=2, kv_quant=kvq,
                                  scan_segment=seg_len)
            np.testing.assert_array_equal(
                np.asarray(base.tokens), np.asarray(seg.tokens),
                err_msg=f"{kvq}/seg{seg_len}")
            np.testing.assert_array_equal(np.asarray(base.lengths),
                                          np.asarray(seg.lengths))
            np.testing.assert_array_equal(
                np.asarray(base.pred_hidden, np.float32),
                np.asarray(seg.pred_hidden, np.float32))


def test_decode_chunk_flat_matches_heads():
    """decode_chunk over the quantized FLAT cache (banded chunk kernel +
    per-row scatter writes) computes what the heads-layout int8 chunk path
    computes: same quant grids, so hidden states agree to attention
    reassociation noise, and the written cache slots dequantize identically."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(4)
    b, t_pre, tc, l_max = 2, 6, 4, 32
    ids_pre = jnp.asarray(rng.randint(3, 500, (b, t_pre)))
    mask = jnp.ones((b, t_pre), bool)
    x_pre = llm.embed(params, ids_pre)

    def prefill(layout):
        cache = llm.init_kv_cache(cfg, b, t_pre, quant="int8", layout=layout)
        hidden, cache = llm.forward(params, cfg, x_pre,
                                    attention_mask=mask, kv_cache=cache)
        from walkgpt_tpu.runtime.generate import _pad_cache_len
        return hidden, _pad_cache_len(cache, l_max)

    cache_len = jnp.array([t_pre, t_pre], jnp.int32)
    ids_chunk = jnp.asarray(rng.randint(3, 500, (b, tc)))
    x_chunk = llm.embed(params, ids_chunk)

    _, heads_cache = prefill("heads")
    hid_h, heads_cache = llm.decode_chunk(params, cfg, heads_cache, x_chunk,
                                          cache_len)
    _, flat_cache = prefill("flat")
    hid_f, flat_cache = llm.decode_chunk(params, cfg, flat_cache, x_chunk,
                                         cache_len)
    np.testing.assert_allclose(np.asarray(hid_f), np.asarray(hid_h),
                               rtol=2e-2, atol=2e-2)
    # layer 0's written chunk K/V slots hold bit-identical quantized rows
    # (deeper layers see reassociation-shifted inputs, so their int rows can
    # differ by +-1 quantization step between the two attention paths)
    n_kv, d = cfg.num_kv_heads, cfg.head_dim
    kh = np.asarray(heads_cache["k"])[0, :, :, t_pre:t_pre + tc]  # [B,kv,T,D]
    kf = np.asarray(flat_cache["k"])[0, :, t_pre:t_pre + tc].reshape(
        b, tc, n_kv, d).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(kh, kf)


@pytest.mark.parametrize("kv", ["int8_flat", "int4_flat"])
def test_speculative_flat_cache_token_identical(kv):
    """Speculative decode COMPOSES with the production flat quantized cache
    (round-3 VERDICT missing #2): tokens identical to wave greedy on the
    SAME cache format, at any acceptance rate."""
    import numpy as np
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import (greedy_generate,
                                              speculative_generate)

    cfg = LLAMA_TINY
    params = llm.init(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(11)
    base = [5, 9, 14, 5, 9, 14, 5, 9, 14, 5, 9]
    ids = np.stack([base, rng.randint(3, 500, len(base))]).astype(np.int64)
    mask = np.ones_like(ids, bool)
    mask[1, -2:] = False
    ids_j = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)
    x = llm.embed(params, ids_j)

    res_g = greedy_generate(params, cfg, x, mask_j, max_new_tokens=16,
                            eos_id=2, pad_id=0, kv_quant=kv)
    for kwargs in ({"prompt_ids": jnp.asarray(np.where(mask, ids, -1))},
                   {"draft_k": 3, "ngram": 2, "prompt_ids": ids_j}):
        res_s = speculative_generate(params, cfg, x, mask_j,
                                     max_new_tokens=16, eos_id=2, pad_id=0,
                                     kv_quant=kv, **kwargs)
        np.testing.assert_array_equal(np.asarray(res_s.tokens),
                                      np.asarray(res_g.tokens))
        np.testing.assert_array_equal(np.asarray(res_s.lengths),
                                      np.asarray(res_g.lengths))
