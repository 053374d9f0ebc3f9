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
