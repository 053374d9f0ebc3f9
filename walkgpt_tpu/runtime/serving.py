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


class ContinuousBatcher:
    """Greedy decode over a stream of (already spliced) prompt embeddings.

    Prompts are bucketed to `prompt_len`; generation budget is
    `max_new_tokens` per request; `segment` decode steps run between host
    refill points."""

    def __init__(self, params, cfg: LLMConfig, *, batch_size: int = 8,
                 prompt_len: int = 512, max_new_tokens: int = 128,
                 segment: int = 32, eos_id: int = 2, pad_id: int = 0,
                 flash_fn=None):
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
        self._build()

    # ------------------------------------------------------------------ jits
    def _build(self):
        cfg, P, B, K = self.cfg, self.P, self.B, self.K
        max_len = self.max_len

        def admit_row(params, pool_k, pool_v, cur_tok, cache_len, done,
                      ids, mask, slot):
            """Prefill one prompt and install it into `slot` — one dispatch."""
            embeds = llm.embed(params, ids).astype(pool_k.dtype)
            cache = llm.init_kv_cache(cfg, 1, P, dtype=pool_k.dtype)
            hidden, cache = llm.forward(params, cfg, embeds,
                                        attention_mask=mask, kv_cache=cache,
                                        flash_fn=self._flash_fn)
            length = mask.astype(jnp.int32).sum(-1)[0]
            last = hidden[0, jnp.maximum(length - 1, 0)]
            logits = llm.lm_logits(params, cfg, last).astype(jnp.float32)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)

            zeros_k = jnp.zeros((pool_k.shape[0], pool_k.shape[2],
                                 max_len - P, pool_k.shape[4]), pool_k.dtype)
            full_k = jnp.concatenate([cache["k"][:, 0], zeros_k], axis=2)
            full_v = jnp.concatenate([cache["v"][:, 0],
                                      jnp.zeros_like(zeros_k)], axis=2)
            pool_k = pool_k.at[:, slot].set(full_k)
            pool_v = pool_v.at[:, slot].set(full_v)
            cur_tok = cur_tok.at[slot].set(tok)
            cache_len = cache_len.at[slot].set(length)
            done = done.at[slot].set(False)
            return pool_k, pool_v, cur_tok, cache_len, done

        self._admit_row = jax.jit(admit_row)

        def decode_segment(params, pool_k, pool_v, cur_tok, cache_len, done):
            key_pos = jnp.arange(max_len, dtype=jnp.int32)[None]

            def step(carry, _):
                pk, pv, tok, clen, dn = carry
                emit = jnp.where(dn, jnp.int32(self.pad_id), tok)
                emit_valid = ~dn
                dn = dn | (tok == self.eos_id)
                x = llm.embed(params, tok)[:, None].astype(pk.dtype)
                key_mask = key_pos <= clen[:, None]
                hidden, cache = llm.decode_step(
                    params, cfg, {"k": pk, "v": pv}, x, clen, key_mask)
                logits = llm.lm_logits(params, cfg,
                                       hidden[:, 0]).astype(jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                nxt = jnp.where(dn, jnp.int32(self.pad_id), nxt)
                clen = jnp.where(dn, clen, clen + 1)
                return (cache["k"], cache["v"], nxt, clen, dn), \
                    (emit, emit_valid)

            carry = (pool_k, pool_v, cur_tok, cache_len, done)
            carry, (toks, valid) = jax.lax.scan(step, carry, None, length=K)
            # one packed host readback: [B, K] tokens, [B, K] valid, [B] done
            packed = jnp.concatenate(
                [toks.T, valid.T.astype(jnp.int32),
                 carry[4].astype(jnp.int32)[:, None]], axis=1)
            return carry, packed

        self._decode_segment = jax.jit(decode_segment)

    # ----------------------------------------------------------------- host
    def _bucket(self, ids: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids = list(ids)[: self.P]
        arr = np.full((1, self.P), self.pad_id, np.int32)
        arr[0, : len(ids)] = ids
        mask = np.zeros((1, self.P), bool)
        mask[0, : len(ids)] = True
        return jnp.asarray(arr), jnp.asarray(mask)

    def run(self, prompts: Iterator[Sequence[int]],
            budgets: Optional[Sequence[int]] = None) -> List[Finished]:
        """Decode every prompt (token-id sequences); returns Finished records
        in completion order. `budgets` optionally caps each request's
        generated tokens individually (default: max_new_tokens for all) —
        variable budgets model variable answer lengths, the regime where slot
        refill beats wave decode."""
        cfg = self.cfg
        prompts = list(prompts)
        n_req = len(prompts)
        if n_req == 0:
            return []
        if budgets is None:
            budgets = [self.N] * n_req
        budgets = [min(int(b), self.N) for b in budgets]
        assert len(budgets) == n_req

        pool_k = jnp.zeros((cfg.num_layers, self.B, cfg.num_kv_heads,
                            self.max_len, cfg.head_dim), self.dtype)
        pool_v = jnp.zeros_like(pool_k)
        cur_tok = jnp.zeros((self.B,), jnp.int32)
        cache_len = jnp.zeros((self.B,), jnp.int32)
        done = jnp.ones((self.B,), bool)          # empty slots count as done

        slot_req = [-1] * self.B                  # request id per slot
        slot_tokens: List[List[int]] = [[] for _ in range(self.B)]
        next_req = 0
        finished: List[Finished] = []

        def admit(slot, pool_k, pool_v, cur_tok, cache_len, done):
            nonlocal next_req
            ids_a, mask = self._bucket(prompts[next_req])
            pool_k, pool_v, cur_tok, cache_len, done = self._admit_row(
                self.params, pool_k, pool_v, cur_tok, cache_len, done,
                ids_a, mask, slot)
            slot_req[slot] = next_req
            slot_tokens[slot] = []
            next_req += 1
            return pool_k, pool_v, cur_tok, cache_len, done

        # initial fill
        for b in range(min(self.B, n_req)):
            pool_k, pool_v, cur_tok, cache_len, done = admit(
                b, pool_k, pool_v, cur_tok, cache_len, done)

        while True:
            (pool_k, pool_v, cur_tok, cache_len, done), packed = \
                self._decode_segment(self.params, pool_k, pool_v, cur_tok,
                                     cache_len, done)
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
                    finished.append(Finished(slot_req[b],
                                             slot_tokens[b][: budget]))
                    slot_req[b] = -1
                    done = done.at[b].set(True)
                    if next_req < n_req:
                        pool_k, pool_v, cur_tok, cache_len, done = admit(
                            b, pool_k, pool_v, cur_tok, cache_len, done)
            if next_req >= n_req and all(r < 0 for r in slot_req):
                break
        return finished
