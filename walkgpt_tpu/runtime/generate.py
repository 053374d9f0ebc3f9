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
    n_iters: Optional[jnp.ndarray] = None  # [] speculative verify iterations
    #                                        (acceptance = lengths.sum()/n_iters)


def _cache_len_axis(name: str, layout_flat: bool) -> int:
    """Length axis of a cache leaf: heads layout [Lyr,B,n_kv,T,D] -> 3
    (scales [Lyr,B,n_kv,T] share it); flat layout values [Lyr,B,T,KD] -> 2
    but flat SCALES are [Lyr,B,n_kv,T] -> 3 (llm.init_kv_cache)."""
    if layout_flat:
        return 3 if name.endswith("_scale") else 2
    return 3


def _pad_cache_len(kv_cache, max_len: int):
    """Grow every cache leaf's length axis to max_len with zeros (masked
    slots). Prefill runs on an exactly-prompt-length cache so each layer's
    K/V write covers its full [.., :t, ..] slab — XLA lowers that as a clean
    in-place update. Writing into a preallocated max_len cache instead made
    XLA materialize a full-size pad temp PER LAYER (2.6 GB at 7B/batch16/
    1343 slots — the round-3 OOM/remat trigger for the 512-token budget);
    padding ONCE here costs a single cache-sized copy."""
    flat = kv_cache["k"].ndim == 4
    out = {}
    for name, buf in kv_cache.items():
        ax = _cache_len_axis(name, flat)
        t = buf.shape[ax]
        if t == max_len:
            out[name] = buf
            continue
        pads = [(0, 0)] * buf.ndim
        pads[ax] = (0, max_len - t)
        out[name] = jnp.pad(buf, pads)
    return out


def _prefill(params, cfg: LLMConfig, inputs_embeds, attention_mask,
             kv_cache, flash_fn, chunk: int = 0, tp_axis=None):
    """Prompt prefill into a preallocated cache. chunk > 0 processes row
    groups sequentially (lax.fori_loop + in-place dynamic_update_slice into
    the shared cache) — prefill activation temps then scale with the chunk,
    not the batch. At 7B batch 24+ the full-batch prefill's qkv/attention
    temporaries alone exceed the v5e HBM (~10.7 GB at batch 32); chunking
    bounds them while decode still runs the full batch."""
    b, t, h = inputs_embeds.shape
    if not chunk or b <= chunk or b % chunk:
        return llm.forward(params, cfg, inputs_embeds,
                           attention_mask=attention_mask, kv_cache=kv_cache,
                           flash_fn=flash_fn, tp_axis=tp_axis)
    hidden0 = jnp.zeros((b, t, h), inputs_embeds.dtype)

    def body(g, carry):
        hidden, cache = carry
        start = g * chunk
        emb = jax.lax.dynamic_slice_in_dim(inputs_embeds, start, chunk, 0)
        msk = jax.lax.dynamic_slice_in_dim(attention_mask, start, chunk, 0)
        sub = {k: jnp.zeros((v.shape[0], chunk) + v.shape[2:], v.dtype)
               for k, v in cache.items()}
        hs, sub = llm.forward(params, cfg, emb, attention_mask=msk,
                              kv_cache=sub, flash_fn=flash_fn,
                              tp_axis=tp_axis)
        hidden = jax.lax.dynamic_update_slice_in_dim(hidden, hs, start, 0)
        cache = {k: jax.lax.dynamic_update_slice_in_dim(cache[k], sub[k],
                                                        start, 1)
                 for k in cache}
        return hidden, cache

    return jax.lax.fori_loop(0, b // chunk, body, (hidden0, kv_cache))


def greedy_generate(params, cfg: LLMConfig, inputs_embeds: jnp.ndarray,
                    attention_mask: jnp.ndarray, *, max_new_tokens: int,
                    eos_id: int, pad_id: int = 0,
                    logits_mask: Optional[jnp.ndarray] = None,
                    flash_fn=None, kv_quant="",
                    prefill_chunk: int = 0,
                    cache_grow_step: int = 0,
                    scan_segment: int = 256,
                    cache_constrain=None,
                    tp_axis: Optional[str] = None) -> GenerateResult:
    """inputs_embeds: [B, T, H] right-padded prompt embeddings;
    attention_mask: [B, T] bool. logits_mask: optional [V] bool of allowed
    tokens (True = allowed) applied at every step. kv_quant stores the KV
    cache as int8 (per-row scales) to halve decode-time cache reads.
    prefill_chunk bounds prefill activation memory (see _prefill).
    cache_constrain: optional fn(cache) -> cache applying mesh sharding
    constraints to the KV cache (parallel/sharding.cache_constrainer) —
    pins the decode cache's dp/tp layout for sharded inference; the scan
    carry inherits it for every step.
    tp_axis: manual-tensor-parallel mesh axis inside a shard_map (cfg and
    params are LOCAL shards; see llm.decode_step) — parallel/tp.py.

    cache_grow_step > 0 runs the decode as SEQUENTIAL scan segments over ONE
    full-length cache allocation: segment k's attention dot reads only the
    static prefix slice [*, :T + (k+1)*step] of the cache. MEASURED
    REGRESSION on v5e (see core/config.decode_cache_grow) — keep 0.

    scan_segment caps the TRIP COUNT of any single decode lax.scan (the
    segments all read/write the same full-length cache — no slicing).
    Measured v5e cliff (7B batch16 int4 weights, int8 KV, 912-slot cache,
    2026-08-18): one 256-trip scan decodes at 12.1 ms/step, one 512-trip
    scan at 58.7 ms/step (both int8 layouts; bf16 caches are immune at
    17.6) — past a trip-count threshold XLA's while-loop double-buffering
    re-copies the quantized cache buffers every iteration instead of
    aliasing them. Splitting at 256 keeps every scan under the cliff;
    tokens are identical by construction."""
    b, t, h = inputs_embeds.shape
    max_len = t + max_new_tokens
    cache_dtype = inputs_embeds.dtype
    layout = "heads"
    if kv_quant in ("int8_flat", "int4_flat"):
        # quantized flat cache + fused Pallas decode attention with in-VMEM
        # dequant (ops/flash_attention.decode_attention_q): full-rate int8
        # rows, or half the bytes again nibble-packed ("int4_flat"). The
        # kernel grids over DECODE_BLOCK-sized length blocks — round the
        # cache up; the masked slots are read but never attended.
        from ..ops.flash_attention import DECODE_BLOCK
        max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK
        layout, kv_quant = "flat", kv_quant[:4]          # "int8" / "int4"
    elif cfg.fused_decode and cfg.pos_emb == "rope" and not kv_quant:
        # flat cache (fused Pallas decode attention) wants a block-multiple
        # length; the extra masked slots are free
        from ..ops.flash_attention import DECODE_BLOCK
        max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK
        layout = "flat"

    def split(step):
        out = [step] * (max_new_tokens // step)
        if max_new_tokens % step:
            out.append(max_new_tokens % step)
        return out

    grow = bool(cache_grow_step and layout == "heads"
                and max_new_tokens > cache_grow_step)
    if grow:
        segments = split(cache_grow_step)
    elif scan_segment and max_new_tokens > scan_segment:
        segments = split(scan_segment)
    else:
        segments = [max_new_tokens]

    # prefill on an exactly-prompt-length cache, then ONE pad to max_len
    # (see _pad_cache_len: avoids per-layer full-size pad temps)
    kv_cache = llm.init_kv_cache(cfg, b, t, dtype=cache_dtype,
                                 quant=kv_quant, layout=layout)

    # ---- prefill ----
    if cache_constrain is not None:
        kv_cache = cache_constrain(kv_cache)
    prefill_hidden, kv_cache = _prefill(
        params, cfg, inputs_embeds, attention_mask, kv_cache, flash_fn,
        prefill_chunk, tp_axis=tp_axis)
    kv_cache = _pad_cache_len(kv_cache, max_len)
    if cache_constrain is not None:
        kv_cache = cache_constrain(kv_cache)
    lengths0 = attention_mask.astype(jnp.int32).sum(-1)            # [B]
    last_idx = jnp.maximum(lengths0 - 1, 0)
    last_hidden = prefill_hidden[jnp.arange(b), last_idx]           # [B, H]

    def pick(hid):
        logits = llm.lm_logits(params, cfg, hid).astype(jnp.float32)
        if logits_mask is not None:
            logits = jnp.where(logits_mask[None], logits, -jnp.inf)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    token0 = pick(last_hidden)

    # Cache layout: prompt slots [0, len_r) per row (right-padded prefill),
    # decode step s at UNIFORM slot t + s for every row. The pad gap
    # [len_r, t) holds zeros and stays masked. Uniform slots turn the
    # per-layer cache writes into scalar-indexed dynamic_update_slices —
    # XLA lowers per-row scatters so poorly they cost more than the whole
    # int4 MLP stack at 7B (measured 2026-08; see llm.decode_step).
    # Rope positions remain the per-row logical positions (cache_len).
    carry = (kv_cache, token0, last_hidden, lengths0, jnp.zeros((b,), bool))
    tok_segs, hid_segs, val_segs = [], [], []
    steps_done = 0
    for seg in segments:
        # growing-cache mode: this segment's attention reads only cache
        # slots [0, attend_len); scan-split mode reads the full cache
        attend_len = (t + steps_done + seg) if grow else max_len
        key_pos = jnp.arange(attend_len, dtype=jnp.int32)[None]     # [1, L]
        prompt_valid = key_pos < lengths0[:, None]                  # [B, L]
        base = t + steps_done

        def step(carry, s, base=base, key_pos=key_pos,
                 prompt_valid=prompt_valid, attend_len=attend_len):
            kv, token, hid_pred, cache_len, done = carry
            emit_valid = ~done
            emit_tok = jnp.where(done, jnp.int32(pad_id), token)
            emit_hid = hid_pred
            done = done | (token == eos_id)

            x = llm.embed(params, token)[:, None].astype(inputs_embeds.dtype)
            key_mask = prompt_valid | ((key_pos >= t) & (key_pos <= base + s))
            hidden, kv = llm.decode_step(
                params, cfg, kv, x, cache_len, key_mask,
                write_slot=base + s,
                attend_len=attend_len if attend_len < max_len else None,
                valid_len=base + s + 1, tp_axis=tp_axis)
            nxt = pick(hidden[:, 0])
            nxt = jnp.where(done, jnp.int32(pad_id), nxt)
            return (kv, nxt, hidden[:, 0], cache_len + 1, done), \
                (emit_tok, emit_hid, emit_valid)

        carry, (tok_s, hid_s, val_s) = jax.lax.scan(
            step, carry, jnp.arange(seg, dtype=jnp.int32))
        tok_segs.append(tok_s)
        hid_segs.append(hid_s)
        val_segs.append(val_s)
        steps_done += seg

    tokens = jnp.concatenate(tok_segs, axis=0) if len(tok_segs) > 1 \
        else tok_segs[0]
    hiddens = jnp.concatenate(hid_segs, axis=0) if len(hid_segs) > 1 \
        else hid_segs[0]
    valids = jnp.concatenate(val_segs, axis=0) if len(val_segs) > 1 \
        else val_segs[0]

    tokens = tokens.T                                               # [B, N]
    pred_hidden = jnp.transpose(hiddens, (1, 0, 2))                 # [B, N, H]
    lengths = valids.T.astype(jnp.int32).sum(-1)
    return GenerateResult(tokens=tokens, pred_hidden=pred_hidden,
                          lengths=lengths, prefill_hidden=prefill_hidden)


# ---------------------------------------------------------------------------
# Speculative decoding (prompt-lookup draft, exact greedy verification)
# ---------------------------------------------------------------------------

def _ngram_propose(history: jnp.ndarray, hist_len: jnp.ndarray,
                   ngram: int, k: int) -> jnp.ndarray:
    """Prompt-lookup draft: find the most recent EARLIER occurrence of each
    row's final `ngram` ids in its own history and propose the k ids that
    followed it (PAVE answers are highly templated — [p]/[SEG]/[distance]
    grammar — so lookup hits are common with real weights).

    history: [B, L] int32 (invalid slots < 0); hist_len: [B] valid counts.
    Returns proposals [B, k] int32 (never negative; falls back to repeating
    the last id, which simply fails verification)."""
    b, l = history.shape
    pos = jnp.arange(l, dtype=jnp.int32)
    # the row's final n-gram
    tail_idx = jnp.clip(hist_len[:, None] - ngram + jnp.arange(ngram)[None],
                        0, l - 1)
    tail = jnp.take_along_axis(history, tail_idx, axis=1)      # [B, n]
    # all length-n windows: win[b, s, j] = history[b, s + j]
    win_idx = jnp.clip(pos[None, :, None] + jnp.arange(ngram)[None, None, :],
                       0, l - 1)
    win = history[jnp.arange(b)[:, None, None], win_idx]       # [B, L, n]
    match = (win == tail[:, None, :]).all(-1)                  # [B, L]
    # window must end strictly before the tail's own start
    match = match & (pos[None] + ngram <= hist_len[:, None] - 1) \
        & (pos[None] + ngram - 1 < l)
    any_match = match.any(-1)
    m = jnp.where(any_match,
                  (l - 1) - jnp.argmax(match[:, ::-1], axis=-1),   # last match
                  0)
    prop_idx = jnp.clip(m[:, None] + ngram + jnp.arange(k)[None],
                        0, l - 1)
    prop_idx = jnp.minimum(prop_idx, jnp.maximum(hist_len[:, None] - 1, 0))
    props = jnp.take_along_axis(history, prop_idx, axis=1)
    last = jnp.take_along_axis(
        history, jnp.maximum(hist_len[:, None] - 1, 0), axis=1)
    props = jnp.where(any_match[:, None], props, last)         # fallback
    return jnp.maximum(props, 0)


def speculative_generate(params, cfg: LLMConfig, inputs_embeds: jnp.ndarray,
                         attention_mask: jnp.ndarray, *, max_new_tokens: int,
                         eos_id: int, pad_id: int = 0, draft_k: int = 8,
                         ngram: int = 3,
                         prompt_ids: Optional[jnp.ndarray] = None,
                         logits_mask: Optional[jnp.ndarray] = None,
                         flash_fn=None, kv_quant="",
                         prefill_chunk: int = 0,
                         cache_constrain=None,
                         tp_axis: Optional[str] = None,
                         draft_fn=None,
                         force_accept: Optional[int] = None) -> GenerateResult:
    """Greedy decode with prompt-lookup speculative verification — every
    emitted token is the model's own argmax given its true prefix; only the
    schedule differs: each iteration verifies `draft_k` drafted tokens in
    ONE decode_chunk pass, so weight HBM reads amortize over accepted runs.
    With real PAVE weights the templated answer grammar gives long accepted
    runs; with a draft miss the loop still advances one token per iteration
    (greedy's rate, plus the small chunk-compute overhead).

    Token-identity fine print: identical to greedy_generate whenever chunk
    and single-token forwards run the same kernel arithmetic — exact on the
    CPU/interpret backend (tests assert bit equality for every cache
    format) and for fp heads-layout caches. On TPU with quantized weight
    kernels (int4/w8a8) the Tc-row chunk projections dispatch different
    (equally valid) kernel paths than the 1-row decode step, so hidden
    states differ at bf16-noise level; argmax ties within ~1e-2 logits can
    then resolve differently. Trained-model logit margins dwarf that noise;
    the output remains a greedy decode of the model under the chunk
    arithmetic.

    prompt_ids: optional [B, T] ids of the prompt timeline (IMAGE sentinel /
    pad positions < 0 are never matched) — extends the lookup window beyond
    the generated text. Returns GenerateResult like greedy_generate.
    draft_fn: optional fn(hist [B, L], hlen [B], n_gen [B]) -> [B, K] int32
    replacing the prompt-lookup proposer — the acceptance-sweep harness
    (benchmarks/bench_spec_curve.py) injects an oracle here to measure
    throughput at CONTROLLED acceptance rates; verification is unchanged,
    so emitted tokens stay the model's own greedy argmax.
    force_accept: HARNESS-ONLY (python int or traced int32 scalar).
    Overrides the acceptance test so every
    iteration accepts exactly this many drafts (+1 bonus token) regardless
    of the match — per-iteration compute (draft proposal, chunk kernel,
    scatter, bookkeeping) is unchanged, so the wall clock measures the
    production schedule at an exactly-controlled acceptance rate even when
    chunk-vs-wave argmax noise (random weights, quantized kernels) would
    derail an oracle draft stream. OUTPUT TOKENS ARE NOT A VALID GREEDY
    DECODE in this mode; never set outside benchmarking."""
    b, t, h = inputs_embeds.shape
    max_len = t + max_new_tokens
    layout = "heads"
    if kv_quant in ("int8_flat", "int4_flat"):
        # production flat quantized layout: chunk verification runs the
        # banded Pallas chunk kernel (decode_attention_q_chunk) — each cache
        # block streams ONCE per verified chunk, so speculation composes
        # with the int4/int8 flat cache instead of downgrading it
        from ..ops.flash_attention import DECODE_BLOCK
        max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK
        layout, kv_quant = "flat", kv_quant[:4]
    kv_cache = llm.init_kv_cache(cfg, b, t, dtype=inputs_embeds.dtype,
                                 quant=kv_quant, layout=layout)

    if cache_constrain is not None:
        kv_cache = cache_constrain(kv_cache)
    prefill_hidden, kv_cache = _prefill(
        params, cfg, inputs_embeds, attention_mask, kv_cache, flash_fn,
        prefill_chunk, tp_axis=tp_axis)
    kv_cache = _pad_cache_len(kv_cache, max_len)
    if cache_constrain is not None:
        kv_cache = cache_constrain(kv_cache)
    lengths0 = attention_mask.astype(jnp.int32).sum(-1)
    last_hidden = prefill_hidden[jnp.arange(b), jnp.maximum(lengths0 - 1, 0)]

    def pick(hid):
        logits = llm.lm_logits(params, cfg, hid).astype(jnp.float32)
        if logits_mask is not None:
            logits = jnp.where(logits_mask[None], logits, -jnp.inf)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    token0 = pick(last_hidden)

    l_hist = t + max_new_tokens
    if prompt_ids is not None:
        hist0 = jnp.where(prompt_ids >= 0, prompt_ids, -2).astype(jnp.int32)
        hist0 = jnp.pad(hist0, ((0, 0), (0, l_hist - prompt_ids.shape[1])),
                        constant_values=-2)
        hlen0 = (prompt_ids >= 0).astype(jnp.int32).sum(-1)
    else:
        hist0 = jnp.full((b, l_hist), -2, jnp.int32)
        hlen0 = jnp.zeros((b,), jnp.int32)

    K = draft_k
    out_tok0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out_hid0 = jnp.zeros((b, max_new_tokens, h), inputs_embeds.dtype)
    out_val0 = jnp.zeros((b, max_new_tokens), bool)
    bidx = jnp.arange(b)[:, None]

    def cond(c):
        done = c[3]
        return (~done).any()

    def body(c):
        (kv, cur, hid_cur, done, n_gen, cache_len, hist, hlen,
         out_tok, out_hid, out_val, n_iter) = c
        if draft_fn is not None:
            props = draft_fn(hist, hlen, n_gen)                # [B, K]
        else:
            props = _ngram_propose(hist, hlen, ngram, K)       # [B, K]
        chunk = jnp.concatenate([cur[:, None], props], axis=1)  # [B, K+1]
        embeds = llm.embed(params, chunk).astype(inputs_embeds.dtype)
        hidden, kv = llm.decode_chunk(params, cfg, kv, embeds, cache_len,
                                      tp_axis=tp_axis)
        preds = pick(hidden.reshape(-1, h)).reshape(b, K + 1)

        ok = props == preds[:, :K]                             # [B, K]
        n_acc = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(-1)  # [B]
        if force_accept is not None:
            # python int or TRACED scalar (the acceptance-sweep harness
            # passes it as a jit argument so one compiled program serves
            # every sweep point)
            n_acc = jnp.full_like(
                n_acc, jnp.minimum(jnp.asarray(force_accept, jnp.int32), K))
        # emitted this iteration: emit[0] = cur, emit[1+j] = props[j] (j<acc)
        emit = chunk                                           # [B, K+1]
        emit_hid = jnp.concatenate([hid_cur[:, None], hidden[:, :K]], axis=1)
        j = jnp.arange(K + 1)[None]
        in_run = j <= n_acc[:, None]
        # stop at the first EOS inside the accepted run
        is_eos = (emit == eos_id) & in_run
        has_eos = is_eos.any(-1)
        eos_at = jnp.where(has_eos, jnp.argmax(is_eos, axis=-1), K + 1)
        eff = jnp.minimum(n_acc + 1, jnp.minimum(eos_at + 1,
                                                 max_new_tokens - n_gen))
        eff = jnp.where(done, 0, jnp.maximum(eff, 0))

        dest = jnp.where((j < eff[:, None]),
                         n_gen[:, None] + j, max_new_tokens)   # drop invalid
        out_tok = out_tok.at[bidx, dest].set(emit, mode="drop")
        out_hid = out_hid.at[bidx, dest].set(emit_hid, mode="drop")
        out_val = out_val.at[bidx, dest].set(True, mode="drop")
        hist = hist.at[bidx, jnp.where(j < eff[:, None],
                                       hlen[:, None] + j, l_hist)
                       ].set(emit, mode="drop")
        hlen = hlen + eff
        n_gen = n_gen + eff
        cache_len = cache_len + eff
        new_cur_idx = jnp.clip(n_acc, 0, K)
        new_cur = jnp.take_along_axis(preds, new_cur_idx[:, None], 1)[:, 0]
        new_hid = jnp.take_along_axis(
            hidden, new_cur_idx[:, None, None].repeat(h, 2), 1)[:, 0]
        done = done | has_eos | (n_gen >= max_new_tokens)
        cur = jnp.where(done, jnp.int32(pad_id), new_cur)
        return (kv, cur, new_hid, done, n_gen, cache_len, hist, hlen,
                out_tok, out_hid, out_val, n_iter + 1)

    init = (kv_cache, token0, last_hidden, jnp.zeros((b,), bool),
            jnp.zeros((b,), jnp.int32), lengths0, hist0, hlen0,
            out_tok0, out_hid0, out_val0, jnp.zeros((), jnp.int32))
    (_, _, _, _, n_gen, _, _, _, out_tok, out_hid, out_val, n_iter) = \
        jax.lax.while_loop(cond, body, init)
    return GenerateResult(tokens=out_tok, pred_hidden=out_hid,
                          lengths=out_val.astype(jnp.int32).sum(-1),
                          prefill_hidden=prefill_hidden, n_iters=n_iter)
