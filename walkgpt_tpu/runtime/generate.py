"""Greedy autoregressive decoding with a persistent HBM KV cache.

TPU-native replacement for HF `generate(num_beams=1)` as the reference drives
it (evaluation_walkgpt.py:569-577, model/walkgpt.py:629-637): the whole decode
is ONE compiled XLA program — prefill writes the cache, then a `lax.scan` of
single-token steps with static shapes and per-row stop flags. Batched rows
stop independently on EOS; finished rows emit pad.

Alongside tokens we return, per generated token, the last-layer hidden state
that *predicted* it — exactly the states the reference's [SEG] extraction
indexes via the 255-offset mask trick (SURVEY §3.3; model/walkgpt.py:653-671
takes hidden[pos-1] for a [SEG] at pos), so downstream SEG->CTP->SAM decoding
needs no re-forward.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from ..models import llm


def truncate_at_keywords(tokens, keyword_id_seqs, tokenizer=None,
                         keywords=None):
    """Host-side KeywordsStoppingCriteria equivalent (mm_utils.py:56-88):
    truncate a generated id sequence at the first occurrence of any keyword id
    sequence; when a tokenizer+keywords are given, also stop when the decoded
    tail contains the keyword string. Returns the truncated list."""
    toks = [int(t) for t in tokens]
    cut = len(toks)
    for seq in keyword_id_seqs:
        seq = [int(s) for s in seq]
        n = len(seq)
        for i in range(len(toks) - n + 1):
            if toks[i:i + n] == seq:
                cut = min(cut, i)
                break
    if tokenizer is not None and keywords:
        for i in range(1, len(toks) + 1):
            tail = tokenizer.decode(toks[max(0, i - 3):i],
                                    skip_special_tokens=True)
            if any(k in tail for k in keywords):
                cut = min(cut, i)
                break
    return toks[:cut]


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray        # [B, max_new] generated ids (pad after EOS)
    pred_hidden: jnp.ndarray   # [B, max_new, H] hidden state that predicted each token
    lengths: jnp.ndarray       # [B] number of generated tokens incl. EOS
    prefill_hidden: jnp.ndarray  # [B, T, H] final-norm hidden states of the prompt


def greedy_generate(params, cfg: LLMConfig, inputs_embeds: jnp.ndarray,
                    attention_mask: jnp.ndarray, *, max_new_tokens: int,
                    eos_id: int, pad_id: int = 0,
                    logits_mask: Optional[jnp.ndarray] = None,
                    flash_fn=None, kv_quant="") -> GenerateResult:
    """inputs_embeds: [B, T, H] right-padded prompt embeddings;
    attention_mask: [B, T] bool. logits_mask: optional [V] bool of allowed
    tokens (True = allowed) applied at every step. kv_quant stores the KV
    cache as int8 (per-row scales) to halve decode-time cache reads."""
    b, t, h = inputs_embeds.shape
    max_len = t + max_new_tokens
    cache_dtype = inputs_embeds.dtype
    layout = "heads"
    if cfg.fused_decode and cfg.pos_emb == "rope" and not kv_quant:
        # flat cache (fused Pallas decode attention) wants a block-multiple
        # length; the extra masked slots are free
        from ..ops.flash_attention import DECODE_BLOCK
        max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK
        layout = "flat"
    kv_cache = llm.init_kv_cache(cfg, b, max_len, dtype=cache_dtype,
                                 quant=kv_quant, layout=layout)

    # ---- prefill ----
    prefill_hidden, kv_cache = llm.forward(
        params, cfg, inputs_embeds, attention_mask=attention_mask,
        kv_cache=kv_cache, flash_fn=flash_fn)
    lengths0 = attention_mask.astype(jnp.int32).sum(-1)            # [B]
    last_idx = jnp.maximum(lengths0 - 1, 0)
    last_hidden = prefill_hidden[jnp.arange(b), last_idx]           # [B, H]

    def pick(hid):
        logits = llm.lm_logits(params, cfg, hid).astype(jnp.float32)
        if logits_mask is not None:
            logits = jnp.where(logits_mask[None], logits, -jnp.inf)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    token0 = pick(last_hidden)

    # cache key validity: prompt slots [0, len) are valid
    key_pos = jnp.arange(max_len, dtype=jnp.int32)[None]            # [1, L]

    def step(carry, _):
        kv, token, hid_pred, cache_len, done = carry
        emit_valid = ~done
        emit_tok = jnp.where(done, jnp.int32(pad_id), token)
        emit_hid = hid_pred
        done = done | (token == eos_id)

        x = llm.embed(params, token)[:, None].astype(inputs_embeds.dtype)
        key_mask = key_pos <= cache_len[:, None]                    # incl. this step
        hidden, kv = llm.decode_step(params, cfg, kv, x, cache_len, key_mask)
        nxt = pick(hidden[:, 0])
        nxt = jnp.where(done, jnp.int32(pad_id), nxt)
        return (kv, nxt, hidden[:, 0], cache_len + 1, done), \
            (emit_tok, emit_hid, emit_valid)

    init = (kv_cache, token0, last_hidden, lengths0,
            jnp.zeros((b,), bool))
    (_, _, _, _, done), (tokens, hiddens, valids) = jax.lax.scan(
        step, init, None, length=max_new_tokens)

    tokens = tokens.T                                               # [B, N]
    pred_hidden = jnp.transpose(hiddens, (1, 0, 2))                 # [B, N, H]
    lengths = valids.T.astype(jnp.int32).sum(-1)
    return GenerateResult(tokens=tokens, pred_hidden=pred_hidden,
                          lengths=lengths, prefill_hidden=prefill_hidden)
