"""Continuous-batching greedy decode engine.

The BASELINE north star calls for "continuous image batching": the wave-based
`greedy_generate` wastes decode steps when answer lengths vary — finished rows
idle until the longest row stops. This engine keeps a fixed pool of B slots
and refills each slot with the next pending prompt the moment its row
finishes, amortizing weight reads across always-full batches.

XLA-compatible design (everything static-shape):
  * one jitted batched prefill initializes a full wave;
  * one jitted single-row prefill computes a new row's KV at the fixed prompt
    bucket length; one jitted insert scatters it into the pool cache and
    resets that slot's counters;
  * one jitted K-step decode segment advances all slots together;
  * the host loop harvests finished rows between segments and admits new work.

All compiled functions are reused across the whole stream — two XLA programs
(admit, segment), regardless of dataset size. One packed array is read back
per segment.

The slot pool is a full llm.init_kv_cache dict, so serving runs the SAME
production cache formats as the wave engine: fp, int8/int4 heads layout, and
the flat int8/int4 quantized layout read by the Pallas banded decode kernel
(kv_quant="int8_flat"/"int4_flat"; decode_step's per-row scatter path writes
each slot at its own cache_len).

NOTE: on a tunneled/remote TPU (this dev environment) per-dispatch latency is
~0.5-1 s, which makes any host-in-the-loop engine slower than the one-program
wave decode; on a directly attached chip (microsecond dispatch) slot refill
wins whenever answer lengths vary. Both modes ship; bench.py uses the fused
wave pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig
from ..models import llm


@dataclasses.dataclass
class Finished:
    request_id: int
    tokens: List[int]
    # [SEG]-position predictor hidden states [n_seg, H] (final-norm, pos-1
    # semantics like GenerateResult.pred_hidden) — populated when the batcher
    # was built with seg_token_ids; feeds CTP -> sam.decode_masks so
    # slot-refill serving drives the FULL pipeline (model/walkgpt.py:607-746)
    seg_hidden: Optional[np.ndarray] = None


def _len_axis(name: str, flat: bool) -> int:
    """Length axis of a cache leaf (mirrors runtime/generate._cache_len_axis)."""
    if flat:
        return 3 if name.endswith("_scale") else 2
    return 3


class ContinuousBatcher:
    """Greedy decode over a stream of prompts — token ids via run(), or
    pre-spliced prompt embeddings (the WalkGPT visual-splice timeline) via
    run(prompt_embeds=...).

    Prompts are bucketed to `prompt_len`; generation budget is
    `max_new_tokens` per request; `segment` decode steps run between host
    refill points. With `seg_token_ids` set, the engine keeps every step's
    predictor hidden state in an on-device ring buffer and harvests the
    [SEG]-position hidden states of each finished request (a [max_segs, H]
    gather per request, not a full-trace readback).

    kv_quant selects the slot-pool cache format (generate.greedy_generate
    semantics): "" = fp heads, "int8"/"int4" = quantized heads layout,
    "int8_flat"/"int4_flat" = flat quantized rows + Pallas banded decode."""

    def __init__(self, params, cfg: LLMConfig, *, batch_size: int = 8,
                 prompt_len: int = 512, max_new_tokens: int = 128,
                 segment: int = 32, eos_id: int = 2, pad_id: int = 0,
                 flash_fn=None, seg_token_ids: Optional[Sequence[int]] = None,
                 max_segs_per_answer: int = 16, kv_quant: str = ""):
        self.params = params
        self.cfg = cfg
        self.B = batch_size
        self.P = prompt_len
        self.N = max_new_tokens
        self.K = segment
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.max_len = prompt_len + max_new_tokens
        self._flash_fn = flash_fn
        self.dtype = params["embed_tokens"]["w"].dtype
        self.seg_ids = tuple(int(s) for s in seg_token_ids) if seg_token_ids \
            else ()
        self.collect_hidden = bool(self.seg_ids)
        self.max_segs = max_segs_per_answer
        self.layout = "heads"
        self.kv_quant = kv_quant or ""
        if self.kv_quant in ("int8_flat", "int4_flat"):
            from ..ops.flash_attention import DECODE_BLOCK
            self.max_len = -(-self.max_len // DECODE_BLOCK) * DECODE_BLOCK
            self.layout, self.kv_quant = "flat", self.kv_quant[:4]
        self._flat = self.layout == "flat"
        self._build()

    # ------------------------------------------------------------------ jits
    def _build(self):
        cfg, P, B, K = self.cfg, self.P, self.B, self.K
        max_len = self.max_len

        def admit_row(params, pool, cur_tok, cache_len, done,
                      hid_buf, cnt, embeds, mask, slot):
            """Prefill one (pre-embedded, possibly visual-spliced) prompt and
            install it into `slot` — one dispatch."""
            cache = llm.init_kv_cache(cfg, 1, P, dtype=self.dtype,
                                      quant=self.kv_quant, layout=self.layout)
            hidden, cache = llm.forward(params, cfg, embeds,
                                        attention_mask=mask, kv_cache=cache,
                                        flash_fn=self._flash_fn)
            length = mask.astype(jnp.int32).sum(-1)[0]
            last = hidden[0, jnp.maximum(length - 1, 0)]
            logits = llm.lm_logits(params, cfg, last).astype(jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)

            # install the prefilled row into the pool's slot: each leaf's
            # first P length-slots are written, the tail stays zero/masked
            new_pool = {}
            for name, buf in pool.items():
                row = cache[name][:, 0]            # drop the batch=1 axis
                ax = _len_axis(name, self._flat)   # length axis in the POOL
                idx = [slice(None)] * buf.ndim
                idx[1] = slot
                idx[ax] = slice(0, row.shape[ax - 1])
                new_pool[name] = buf.at[tuple(idx)].set(row)
            cur_tok = cur_tok.at[slot].set(tok)
            cache_len = cache_len.at[slot].set(length)
            done = done.at[slot].set(False)
            if self.collect_hidden:
                # hid_buf[slot, i] = hidden that PREDICTED generated token i;
                # token 0 comes from the prefill's last hidden state
                hid_buf = hid_buf.at[slot, 0].set(last.astype(hid_buf.dtype))
                cnt = cnt.at[slot].set(0)
            return new_pool, cur_tok, cache_len, done, hid_buf, cnt

        self._admit_row = jax.jit(admit_row)
        self._embed = jax.jit(lambda p, ids: llm.embed(p, ids).astype(self.dtype))

        def decode_segment(params, pool, cur_tok, cache_len, done,
                           hid_buf, cnt):
            key_pos = jnp.arange(max_len, dtype=jnp.int32)[None]
            batch_idx = jnp.arange(B)

            def step(carry, _):
                pool_c, tok, clen, dn, hb, ct = carry
                emit = jnp.where(dn, jnp.int32(self.pad_id), tok)
                emit_valid = ~dn
                dn = dn | (tok == self.eos_id)
                x = llm.embed(params, tok)[:, None].astype(self.dtype)
                key_mask = key_pos <= clen[:, None]
                hidden, pool_c = llm.decode_step(
                    params, cfg, pool_c, x, clen, key_mask)
                logits = llm.lm_logits(params, cfg,
                                       hidden[:, 0]).astype(jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                nxt = jnp.where(dn, jnp.int32(self.pad_id), nxt)
                clen = jnp.where(dn, clen, clen + 1)
                ct2 = jnp.where(emit_valid, ct + 1, ct)
                if self.collect_hidden:
                    # this step's hidden predicts token #ct2; ring position
                    # N is the overflow sink (beyond every budget)
                    idx = jnp.minimum(ct2, self.N)
                    hb = hb.at[batch_idx, idx].set(
                        hidden[:, 0].astype(hb.dtype))
                return (pool_c, nxt, clen, dn, hb, ct2), (emit, emit_valid)

            carry = (pool, cur_tok, cache_len, done, hid_buf, cnt)
            carry, (toks, valid) = jax.lax.scan(step, carry, None, length=K)
            # one packed host readback: [B, K] tokens, [B, K] valid, [B] done
            packed = jnp.concatenate(
                [toks.T, valid.T.astype(jnp.int32),
                 carry[3].astype(jnp.int32)[:, None]], axis=1)
            return carry, packed

        self._decode_segment = jax.jit(decode_segment)

        def gather_hidden(hid_buf, slot, idx):
            """[max_segs] positions of one slot's ring -> [max_segs, H]."""
            return jnp.take(jnp.take(hid_buf, slot, axis=0), idx, axis=0)

        self._gather_hidden = jax.jit(gather_hidden)

    # ----------------------------------------------------------------- host
    def _bucket_embeds(self, req) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One request -> ([1, P, H] embeds, [1, P] mask). A request is either
        a token-id sequence (embedded on device) or a pre-spliced [T, H]
        embedding timeline (the WalkGPT visual-splice output)."""
        a = np.asarray(req)
        if a.ndim == 2:                           # [T, H] embeddings
            t = min(a.shape[0], self.P)
            mask = np.zeros((1, self.P), bool)
            mask[0, :t] = True
            out = np.zeros((1, self.P, a.shape[1]), np.float32)
            out[0, :t] = a[:t]
            return jnp.asarray(out, self.dtype), jnp.asarray(mask)
        ids = list(req)[: self.P]
        arr = np.full((1, self.P), self.pad_id, np.int32)
        arr[0, : len(ids)] = ids
        mask = np.zeros((1, self.P), bool)
        mask[0, : len(ids)] = True
        return self._embed(self.params, jnp.asarray(arr)), jnp.asarray(mask)

    def run(self, prompts: Iterator[Sequence[int]],
            budgets: Optional[Sequence[int]] = None) -> List[Finished]:
        """Decode every prompt; returns Finished records in completion order.

        Each prompt is a token-id sequence OR a pre-spliced [T, H] embedding
        timeline. `budgets` optionally caps each request's generated tokens
        individually (default: max_new_tokens for all) — variable budgets
        model variable answer lengths, the regime where slot refill beats
        wave decode. With seg_token_ids configured, each Finished carries the
        [SEG]-position predictor hidden states (Finished.seg_hidden)."""
        cfg = self.cfg
        prompts = list(prompts)
        n_req = len(prompts)
        if n_req == 0:
            return []
        if budgets is None:
            budgets = [self.N] * n_req
        budgets = [min(int(b), self.N) for b in budgets]
        assert len(budgets) == n_req

        pool = llm.init_kv_cache(cfg, self.B, self.max_len, dtype=self.dtype,
                                 quant=self.kv_quant, layout=self.layout)
        cur_tok = jnp.zeros((self.B,), jnp.int32)
        cache_len = jnp.zeros((self.B,), jnp.int32)
        done = jnp.ones((self.B,), bool)          # empty slots count as done
        hdim = self.params["embed_tokens"]["w"].shape[1]
        # ring of predictor hiddens per slot; position N is the overflow sink
        hid_buf = jnp.zeros((self.B, self.N + 1, hdim)
                            if self.collect_hidden else (1, 1, 1), self.dtype)
        cnt = jnp.zeros((self.B,), jnp.int32)

        slot_req = [-1] * self.B                  # request id per slot
        slot_tokens: List[List[int]] = [[] for _ in range(self.B)]
        next_req = 0
        finished: List[Finished] = []

        def admit(slot, pool, cur_tok, cache_len, done, hid_buf, cnt):
            nonlocal next_req
            embeds, mask = self._bucket_embeds(prompts[next_req])
            (pool, cur_tok, cache_len, done, hid_buf, cnt) = self._admit_row(
                self.params, pool, cur_tok, cache_len, done,
                hid_buf, cnt, embeds, mask, slot)
            slot_req[slot] = next_req
            slot_tokens[slot] = []
            next_req += 1
            return pool, cur_tok, cache_len, done, hid_buf, cnt

        def harvest(slot, budget, hid_buf) -> Finished:
            toks = slot_tokens[slot][: budget]
            fin = Finished(slot_req[slot], toks)
            if self.collect_hidden:
                seg_pos = [i for i, t in enumerate(toks)
                           if t in self.seg_ids][: self.max_segs]
                if seg_pos:
                    idx = np.zeros((self.max_segs,), np.int32)
                    idx[: len(seg_pos)] = seg_pos
                    hid = np.asarray(self._gather_hidden(
                        hid_buf, jnp.int32(slot), jnp.asarray(idx)))
                    fin.seg_hidden = hid[: len(seg_pos)]
                else:
                    fin.seg_hidden = np.zeros((0, hid_buf.shape[-1]),
                                              np.float32)
            return fin

        state = (pool, cur_tok, cache_len, done, hid_buf, cnt)
        # initial fill
        for b in range(min(self.B, n_req)):
            state = admit(b, *state)

        while True:
            carry, packed = self._decode_segment(self.params, *state)
            state = carry
            packed_h = np.asarray(packed)      # single host readback
            toks_h = packed_h[:, : self.K]
            valid_h = packed_h[:, self.K: 2 * self.K].astype(bool)
            done_h = packed_h[:, -1].astype(bool)
            for b in range(self.B):
                if slot_req[b] < 0:
                    continue
                slot_tokens[b].extend(int(t) for t, v in
                                      zip(toks_h[b], valid_h[b]) if v)
                budget = budgets[slot_req[b]]
                over_budget = len(slot_tokens[b]) >= budget
                if done_h[b] or over_budget:
                    finished.append(harvest(b, budget, state[4]))
                    slot_req[b] = -1
                    state = state[:3] + (state[3].at[b].set(True),) + state[4:]
                    if next_req < n_req:
                        state = admit(b, *state)
            if next_req >= n_req and all(r < 0 for r in slot_req):
                break
        return finished
