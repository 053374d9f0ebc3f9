"""Pallas flash attention vs the reference einsum attention (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.ops.attention import decomposed_rel_pos_bias, mha
from walkgpt_tpu.ops.flash_attention import flash_attention, sam_flash_attention


def rand(*shape, seed=0):
    return jnp.array(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_flash_matches_mha_noncausal():
    q, k, v = rand(2, 2, 48, 16, seed=0), rand(2, 2, 48, 16, seed=1), \
        rand(2, 2, 48, 16, seed=2)
    got = flash_attention(q, k, v, False, 32, 32)
    ref = mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_flash_matches_mha_causal():
    q, k, v = rand(1, 2, 40, 16, seed=3), rand(1, 2, 40, 16, seed=4), \
        rand(1, 2, 40, 16, seed=5)
    got = flash_attention(q, k, v, True, 16, 16)
    causal = jnp.tril(jnp.ones((40, 40), bool))[None, None]
    ref = mha(q, k, v, mask=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_flash_key_padding():
    q, k, v = rand(2, 1, 24, 16, seed=6), rand(2, 1, 24, 16, seed=7), \
        rand(2, 1, 24, 16, seed=8)
    key_valid = jnp.array(np.arange(24)[None] < np.array([[20], [24]]))
    got = flash_attention(q, k, v, True, 16, 16, key_valid)
    causal = jnp.tril(jnp.ones((24, 24), bool))[None, None]
    mask = causal & key_valid[:, None, None, :]
    ref = mha(q, k, v, mask=mask)
    # rows past each sequence's end attend to nothing real; compare valid rows
    for b in range(2):
        n = int(key_valid[b].sum())
        np.testing.assert_allclose(np.asarray(got)[b, :, :n],
                                   np.asarray(ref)[b, :, :n],
                                   rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_reference():
    q, k, v = rand(1, 1, 32, 8, seed=9), rand(1, 1, 32, 8, seed=10), \
        rand(1, 1, 32, 8, seed=11)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, True, 16, 16).sum()

    def loss_ref(q, k, v):
        causal = jnp.tril(jnp.ones((32, 32), bool))[None, None]
        return mha(q, k, v, mask=causal).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_sam_flash_matches_bias_mha():
    gh, gw, d = 4, 8, 16
    n = gh * gw
    q, k, v = rand(1, 2, n, d, seed=12), rand(1, 2, n, d, seed=13), \
        rand(1, 2, n, d, seed=14)
    rel_h = rand(1, 2, n, gh, seed=15)
    rel_w = rand(1, 2, n, gw, seed=16)
    got = sam_flash_attention(q, k, v, rel_h, rel_w, (gh, gw), 16, 16)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(1, 2, n, n)
    ref = mha(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_sam_encoder_flash_parity():
    """Full SAM tiny encoder: flash path == reference path."""
    from walkgpt_tpu.core.config import SAM_VIT_TINY
    from walkgpt_tpu.models import sam_encoder
    params = sam_encoder.init(jax.random.PRNGKey(0), SAM_VIT_TINY)
    # give rel-pos tables nonzero values so the bias actually matters
    import dataclasses
    params = jax.tree_util.tree_map(lambda x: x, params)
    for blk in params["blocks"]:
        if "rel_pos_h" in blk:
            blk["rel_pos_h"] = 0.1 * jnp.arange(
                blk["rel_pos_h"].size, dtype=jnp.float32).reshape(
                blk["rel_pos_h"].shape)
            blk["rel_pos_w"] = -0.05 * jnp.arange(
                blk["rel_pos_w"].size, dtype=jnp.float32).reshape(
                blk["rel_pos_w"].shape)
    x = rand(1, 64, 64, 3, seed=17)
    ref = sam_encoder.apply(params, SAM_VIT_TINY, x, use_flash=False)
    got = sam_encoder.apply(params, SAM_VIT_TINY, x, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4,
                               atol=5e-5)


def test_llm_forward_flash_parity():
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    params = llm.init(jax.random.PRNGKey(1), LLAMA_TINY)
    ids = jnp.array(np.random.RandomState(18).randint(3, 500, (2, 20)))
    mask = jnp.array(np.arange(20)[None] < np.array([[15], [20]]))
    x = llm.embed(params, ids)
    ref, _ = llm.forward(params, LLAMA_TINY, x, attention_mask=mask)
    flash_fn = lambda q, k, v, kv: flash_attention(q, k, v, True, 16, 16,
                                                   key_valid=kv)
    got, _ = llm.forward(params, LLAMA_TINY, x, attention_mask=mask,
                         flash_fn=flash_fn)
    # valid positions match
    np.testing.assert_allclose(np.asarray(got[0, :15]), np.asarray(ref[0, :15]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=2e-5)
