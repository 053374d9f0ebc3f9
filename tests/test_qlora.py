"""QLoRA: partitioned gradients over a frozen (quantized) base.

The reference's actual training recipe wraps q/v with fresh r=8 LoRA and
trains only adapters + embed_tokens + lm_head + mask decoder + projectors
(/root/reference/train_walkgpt.py:263-359). runtime/train.py partitions the
param tree by that policy and differentiates ONLY the trainable subtree —
which is what lets the frozen base be integer-quantized (ops/quant int8,
ops/int4 packed-int4) and a 13B recipe fit one 16 GB v5e chip.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import tiny_config
from walkgpt_tpu.data import conversation as conv_lib
from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
from walkgpt_tpu.models import walkgpt
from walkgpt_tpu.ops.quant import quantize_llm, quantize_sam_encoder
from walkgpt_tpu.parallel import sharding as shd
from walkgpt_tpu.runtime import checkpoint as ck
from walkgpt_tpu.runtime import train as tr
from tests.test_train_sharded import device_batch


@pytest.fixture(scope="module")
def setup():
    conv_lib.set_default_conversation("llava_v1")
    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    params["llm"] = ck.init_lora(params["llm"], jax.random.PRNGKey(7),
                                 r=4, alpha=8.0)
    return tok, st, cfg, params


def _flat(tree):
    return {shd._path_str(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_partition_combine_roundtrip(setup):
    tok, st, cfg, params = setup
    mask = tr.trainable_mask(params, tr.TrainConfig())
    trainable, frozen = tr.partition_params(params, mask)
    # disjoint: every leaf lives in exactly one partition
    ft, ff, fp = _flat(trainable), _flat(frozen), _flat(params)
    assert set(ft) | set(ff) == set(fp)
    assert not (set(ft) & set(ff))
    # lora adapters train; their peft scale and the base projections don't
    assert any(k.endswith("lora_a") for k in ft)
    assert any(k.endswith("lora_scale") for k in ff)
    assert all(not k.startswith("sam/image_encoder") for k in ft)
    back = tr.combine_params(trainable, frozen)
    for k, v in fp.items():
        got = _flat(back)[k]
        assert got is v or bool(jnp.all(got == v))


@pytest.mark.slow  # compiles TWO unsharded fwd+bwd graphs; the partition
# semantics are covered by the quantized-base test in the default gate
def test_qlora_step_matches_masked_train_step(setup):
    """On a dense base, the partitioned step must reproduce train_step's
    trainable updates exactly (same grads, same clip-norm over the same
    trainable set — train_step's optax.masked clips only masked-in leaves)."""
    tok, st, cfg, params = setup
    tcfg = tr.TrainConfig(warmup_steps=1, total_steps=10)
    batch, max_segs = device_batch(tok)

    full_state, opt_full = tr.init_state(params, tcfg)
    for _ in range(2):       # step 0 has lr=0 (warmup); take two steps
        full_state, m_full = tr.train_step(
            full_state, batch, opt=opt_full, model_cfg=cfg, max_segs=max_segs)

    qstate, opt_q, frozen = tr.init_qlora_state(params, tcfg)
    for _ in range(2):
        qstate, m_q = tr.qlora_train_step(
            qstate, frozen, batch, opt=opt_q, model_cfg=cfg, max_segs=max_segs)

    np.testing.assert_allclose(float(m_q["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    mask = tr.trainable_mask(params, tcfg)
    want = _flat(tr.partition_params(full_state.params, mask)[0])
    got = _flat(qstate.params)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(want[k], np.float32),
                                   rtol=2e-4, atol=2e-6, err_msg=k)


def test_qlora_quantized_base_trains(setup):
    """int8-attention + packed-int4-MLP frozen base + int8 SAM encoder:
    the partitioned step runs, the integer base never changes, and the
    adapters move (lora_b first — lora_a's grad is zero while b==0)."""
    tok, st, cfg, params = setup
    qparams = dict(params)
    qparams["llm"] = quantize_llm(params["llm"], act_quant=False,
                                  mlp_int4=True, quantize_lm_head=False)
    qparams["sam"] = quantize_sam_encoder(params["sam"])
    # adapters survive quantization (convert_proj keeps non-"w" leaves)
    fq = _flat(qparams)
    assert any(k.endswith("lora_a") for k in fq)
    assert any(k.endswith("w_q") for k in fq)
    assert any(k.endswith("w_p4") for k in fq)
    assert "llm/lm_head/w" in fq, "trainable head must stay dense"

    tcfg = tr.TrainConfig(warmup_steps=1, total_steps=10)
    state, opt, frozen = tr.init_qlora_state(qparams, tcfg)
    batch, max_segs = device_batch(tok)
    frozen_before = jax.tree_util.tree_map(np.asarray, frozen)
    losses = []
    for _ in range(2):
        state, metrics = tr.qlora_train_step(
            state, frozen, batch, opt=opt, model_cfg=cfg, max_segs=max_segs)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses

    # frozen tree is untouched (it is an input, not an output — compare to
    # the pre-step snapshot for paranoia)
    for k, v in _flat(frozen_before).items():
        np.testing.assert_array_equal(np.asarray(_flat(frozen)[k]), v,
                                      err_msg=k)
    fb = _flat(state.params)
    moved = [k for k in fb if k.endswith("lora_b")
             and float(jnp.abs(fb[k]).max()) > 0]
    assert moved, "no lora_b moved after two steps"
    # trainable head/embeddings get grads through the quantized stack
    emb_delta = float(jnp.abs(
        fb["llm/embed_tokens/w"].astype(jnp.float32)
        - params["llm"]["embed_tokens"]["w"].astype(jnp.float32)).max())
    assert emb_delta > 0


def test_qlora_guards(setup):
    tok, st, cfg, params = setup
    tcfg = tr.TrainConfig()
    # quantized lm_head would be a trainable integer leaf -> loud error
    bad = dict(params)
    bad["llm"] = quantize_llm(params["llm"], act_quant=False)
    with pytest.raises(ValueError, match="integer dtype"):
        tr.init_qlora_state(bad, tcfg)
    # W8A8 round() has zero gradient -> loud error
    bad2 = dict(params)
    bad2["llm"] = quantize_llm(params["llm"], act_quant=True,
                               quantize_lm_head=False)
    with pytest.raises(ValueError, match="act_quant=False"):
        tr.init_qlora_state(bad2, tcfg)


def test_qlora_int4_proj_attention_base(setup):
    """Per-projection packed-int4 attention base (convert_attn_int4_proj —
    the 13B-fits-one-chip lever): the partitioned step runs, integer bases
    stay frozen, adapters move; and init_lora can attach FRESH adapters
    directly onto a w_p4 base (the bench_train order)."""
    tok, st, cfg, params = setup
    qparams = dict(params)
    qparams["llm"] = quantize_llm(params["llm"], act_quant=False,
                                  mlp_int4=True, attn_int4_proj=True,
                                  quantize_lm_head=False)
    fq = _flat(qparams)
    assert any(k.endswith("attn/q/w_p4") for k in fq)
    assert any(k.endswith("attn/q/lora_a") for k in fq)   # adapters survive
    batch, max_segs = device_batch(tok)
    tcfg = tr.TrainConfig(warmup_steps=1, total_steps=10)
    state, opt, frozen = tr.init_qlora_state(qparams, tcfg)
    b0 = {k: np.asarray(v) for k, v in _flat(state.params).items()
          if k.endswith("lora_b")}
    for _ in range(2):
        state, metrics = tr.qlora_train_step(
            state, frozen, batch, opt=opt, model_cfg=cfg, max_segs=max_segs)
    assert np.isfinite(float(metrics["loss"]))
    b1 = {k: np.asarray(v) for k, v in _flat(state.params).items()
          if k.endswith("lora_b")}
    assert any(np.abs(b1[k] - b0[k]).max() > 0 for k in b1)

    # fresh-LoRA attach onto an already-int4 base (init_lora w_p4 branch)
    bare = quantize_llm(walkgpt.init(jax.random.PRNGKey(1), cfg)["llm"],
                        act_quant=False, mlp_int4=True, attn_int4_proj=True,
                        quantize_lm_head=False)
    withlora = ck.init_lora(bare, jax.random.PRNGKey(2), r=4, alpha=8.0)
    fl = _flat(withlora)
    a = next(v for k, v in fl.items() if k.endswith("attn/q/lora_a"))
    p4 = next(v for k, v in fl.items() if k.endswith("attn/q/w_p4"))
    assert a.shape == (p4.shape[0] * 2, 4)
