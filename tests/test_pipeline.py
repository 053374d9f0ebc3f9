"""Pipeline-parallel LLM tests over the 8-virtual-device CPU mesh.

The reference has no pipeline parallelism (SURVEY §2.6 checklist) — this is
framework capability beyond parity: parallel/pipeline.py's GPipe schedule
(shard_map + ppermute) must be bit-for-bit the same math as the sequential
decoder loop, forward AND backward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from walkgpt_tpu.core.config import LLMConfig
from walkgpt_tpu.models import llm
from walkgpt_tpu.parallel import pipeline as ppl

TINY = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                 num_layers=4, num_heads=4, num_kv_heads=4,
                 max_position_embeddings=128)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    params = llm.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    b, t = 4, 16
    x = jnp.asarray(rng.randn(b, t, TINY.hidden_size), jnp.float32) * 0.1
    am = jnp.asarray(rng.rand(b, t) > 0.2)
    am = am.at[:, 0].set(True)
    return mesh, params, x, am


def test_stack_roundtrip(setup):
    _, params, _, _ = setup
    stacked = ppl.stack_layers(params["layers"])
    back = ppl.unstack_layers(stacked)
    assert len(back) == len(params["layers"])
    for a, b in zip(jax.tree_util.tree_leaves(back[2]),
                    jax.tree_util.tree_leaves(params["layers"][2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_forward_matches_sequential(setup):
    mesh, params, x, am = setup
    ref, _ = llm.forward(params, TINY, x, attention_mask=am)
    out = llm.forward_pipelined(params, TINY, x, mesh=mesh, n_micro=2,
                                attention_mask=am)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pipelined_forward_sharded_stacked_params(setup):
    """Layer params stored stacked + P('pp')-sharded (the real memory-scaling
    layout) under jit."""
    mesh, params, x, am = setup
    stacked = ppl.stack_layers(params["layers"])
    specs = ppl.stacked_pspecs(stacked)
    sharded = jax.tree_util.tree_map(
        lambda z, s: jax.device_put(z, NamedSharding(mesh, s)), stacked, specs)
    rest = {k: v for k, v in params.items() if k != "layers"}

    @jax.jit
    def fn(rest, stacked, x, am):
        # only final_norm is read from `rest` when stacked_layers is given
        return llm.forward_pipelined(rest, TINY, x, mesh=mesh, n_micro=2,
                                     attention_mask=am,
                                     stacked_layers=stacked)
    out = fn(rest, sharded, x, am)
    ref, _ = llm.forward(params, TINY, x, attention_mask=am)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pipelined_grads_match_sequential(setup):
    """Backward through scan + ppermute + psum: layer grads identical to the
    sequential decoder's. Loss projects h onto a random vector — a bare
    mean(h^2) through the all-ones final RMSNorm is constant (== 1) and
    would zero every layer grad, making the comparison vacuous."""
    mesh, params, x, am = setup
    v = jnp.asarray(np.random.RandomState(7).randn(TINY.hidden_size),
                    jnp.float32)

    def loss_seq(p):
        h, _ = llm.forward(p, TINY, x, attention_mask=am)
        return ((h.astype(jnp.float32) @ v) ** 2).mean()

    def loss_pp(p):
        h = llm.forward_pipelined(p, TINY, x, mesh=mesh, n_micro=2,
                                  attention_mask=am)
        return ((h.astype(jnp.float32) @ v) ** 2).mean()

    g_ref = jax.grad(loss_seq)(params)
    g_pp = jax.grad(loss_pp)(params)
    ref_norm = sum(float((np.asarray(g) ** 2).sum()) for g in
                   jax.tree_util.tree_leaves(g_ref["layers"]))
    assert ref_norm > 0.0, "reference layer grads vanished — vacuous test"
    for i in range(TINY.num_layers):
        for a, b in zip(jax.tree_util.tree_leaves(g_pp["layers"][i]),
                        jax.tree_util.tree_leaves(g_ref["layers"][i])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp["final_norm"]),
                    jax.tree_util.tree_leaves(g_ref["final_norm"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_pipelined_remat_grads_match(setup):
    """remat=True (per-layer rematerialization inside each stage) changes
    memory, not math."""
    mesh, params, x, am = setup
    v = jnp.asarray(np.random.RandomState(7).randn(TINY.hidden_size),
                    jnp.float32)
    from walkgpt_tpu.parallel import pipeline as ppl2

    def loss(p, remat):
        stacked = ppl2.stack_layers(p["layers"])
        pos = jnp.broadcast_to(jnp.arange(x.shape[1], dtype=jnp.int32)[None],
                               x.shape[:2])
        causal = jnp.tril(jnp.ones((x.shape[1], x.shape[1]), bool))
        mask = jnp.broadcast_to(causal[None, None],
                                (x.shape[0], 1) + causal.shape)
        mask = mask & am[:, None, None, :]

        def block(layer, xx, aux):
            from walkgpt_tpu.models.llm import _block
            y, _ = _block(layer, TINY, xx, positions=aux["p"],
                          mask=aux["m"], bias=None, flash_fn=None)
            return y

        h = ppl2.pipeline_blocks(stacked, x, {"p": pos, "m": mask}, block,
                                 mesh=mesh, n_micro=2, remat=remat)
        return ((h.astype(jnp.float32) @ v) ** 2).mean()

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1["layers"]),
                    jax.tree_util.tree_leaves(g0["layers"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-7)


def test_bubble_microbatch_counts(setup):
    """n_micro = 1 (no overlap) and a deeper n_micro = 4 schedule (B doubled
    so each microbatch still divides over dp) both match."""
    mesh, params, x, am = setup
    ref, _ = llm.forward(params, TINY, x, attention_mask=am)
    out = llm.forward_pipelined(params, TINY, x, mesh=mesh,
                                n_micro=1, attention_mask=am)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    x2 = jnp.concatenate([x, x], axis=0)
    am2 = jnp.concatenate([am, am], axis=0)
    ref2, _ = llm.forward(params, TINY, x2, attention_mask=am2)
    out2 = llm.forward_pipelined(params, TINY, x2, mesh=mesh,
                                 n_micro=4, attention_mask=am2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-6)
