import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import CTPConfig, MSQPConfig
from walkgpt_tpu.models.projectors import (ctp_apply, ctp_init, msqp_apply,
                                           msqp_init, tiny_xattn_apply,
                                           tiny_xattn_init, _pool_grid)


def test_msqp_output_shape_full_config():
    cfg = MSQPConfig(sam_dim=16, d_proj=32, num_heads=2, queries_x1=12,
                     queries_x2=8, queries_x4=8, queries_global=4,
                     target_square_side=6, gate_hidden=8)
    params = msqp_init(jax.random.PRNGKey(0), cfg, llm_dim=24)
    x = jnp.array(np.random.RandomState(0).randn(2, 64, 16), jnp.float32)  # 8x8 grid
    out = msqp_apply(params, cfg, x)
    assert out.shape == (2, 36, 24)
    assert cfg.num_queries == 32 and cfg.num_tokens == 36
    assert jnp.isfinite(out).all()


def test_msqp_pad_tokens_identical_across_batch():
    cfg = MSQPConfig(sam_dim=8, d_proj=16, num_heads=2, queries_x1=2,
                     queries_x2=1, queries_x4=0, queries_global=1,
                     target_square_side=3, gate_hidden=4)
    params = msqp_init(jax.random.PRNGKey(1), cfg, llm_dim=8)
    x = jnp.array(np.random.RandomState(1).randn(2, 16, 8), jnp.float32)
    out = np.asarray(msqp_apply(params, cfg, x))
    # queries 4, tokens 9 -> last 5 are the (projected) pad token, batch-const
    np.testing.assert_allclose(out[0, 4:], out[1, 4:], rtol=1e-5)
    np.testing.assert_allclose(out[0, 4], out[0, 5], rtol=1e-5)


def test_pool_grid_matches_avgpool():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 16, 4).astype(np.float32)   # 4x4 grid
    out = np.asarray(_pool_grid(jnp.array(x), 4, 4, 2))
    grid = x.reshape(1, 4, 4, 4)
    ref = grid.reshape(1, 2, 2, 2, 2, 4).mean(axis=(2, 4)).reshape(1, 4, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_ctp_normalized_output():
    cfg = CTPConfig(out_dim=32)
    params = ctp_init(jax.random.PRNGKey(3), cfg, in_dim=64)
    x = jnp.array(np.random.RandomState(3).randn(5, 64), jnp.float32)
    y = np.asarray(ctp_apply(params, x))
    assert y.shape == (5, 32)
    # log_temp=0 -> scale 1 -> unit norm
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1), 1.0, atol=1e-5)
    # raising log_temp scales the output
    params2 = dict(params, log_temp=jnp.array([np.log(2.0)], jnp.float32))
    y2 = np.asarray(ctp_apply(params2, x))
    np.testing.assert_allclose(np.linalg.norm(y2, axis=-1), 2.0, atol=1e-4)


def test_tiny_xattn_matches_numpy():
    params = tiny_xattn_init(jax.random.PRNGKey(4), d=8)
    rng = np.random.RandomState(4)
    q = rng.randn(3, 8).astype(np.float32)
    kv = rng.randn(3, 5, 8).astype(np.float32)
    out, attn = tiny_xattn_apply(params, jnp.array(q), jnp.array(kv))
    wq = np.asarray(params["wq"]["w"]); wk = np.asarray(params["wk"]["w"])
    wv = np.asarray(params["wv"]["w"]); wo = np.asarray(params["out"]["w"])
    logits = np.einsum("md,mnd->mn", q @ wq, kv @ wk) / np.sqrt(8)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = (np.einsum("mn,mnd->md", p, kv @ wv)) @ wo
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), p, rtol=1e-4, atol=1e-6)
    assert attn.shape == (3, 5)


def test_msqp_gate_suppresses_tokens():
    """Driving gate fc2 bias very negative zeroes the kv stream -> outputs
    should collapse toward the query-only fixed point (kv ~ 0)."""
    cfg = MSQPConfig(sam_dim=8, d_proj=16, num_heads=2, queries_x1=2,
                     queries_x2=0, queries_x4=0, queries_global=0,
                     target_square_side=2, gate_hidden=4)
    params = msqp_init(jax.random.PRNGKey(5), cfg, llm_dim=8)
    x = jnp.array(np.random.RandomState(5).randn(1, 16, 8), jnp.float32)
    out_open = msqp_apply(params, cfg, x)
    closed = jax.tree_util.tree_map(lambda v: v, params)
    closed["gate"]["fc2"]["b"] = jnp.full_like(params["gate"]["fc2"]["b"], -1e4)
    out_closed = msqp_apply(closed, cfg, x)
    assert float(jnp.abs(out_open - out_closed).max()) > 1e-4
    # with the gate closed, outputs are input-independent
    x2 = x + 3.0
    out_closed2 = msqp_apply(closed, cfg, x2)
    np.testing.assert_allclose(np.asarray(out_closed), np.asarray(out_closed2),
                               atol=1e-4)
