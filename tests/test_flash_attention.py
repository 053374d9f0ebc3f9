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


def test_flash_bwd_padded_masked_multihead():
    """Pallas backward vs einsum vjp at awkward shapes: padding in both N and
    M directions, key-validity mask, multiple heads, causal and not."""
    b, h, n, d = 2, 3, 70, 16
    q, k, v = rand(b, h, n, d, seed=20), rand(b, h, n, d, seed=21), \
        rand(b, h, n, d, seed=22)
    kvalid = np.ones((b, n), bool)
    kvalid[0, 50:] = False
    kvalid[1, 61:] = False
    kvalid_j = jnp.asarray(kvalid)
    g_out = rand(b, h, n, d, seed=23)

    for causal in (False, True):
        def loss_flash(q, k, v):
            o = flash_attention(q, k, v, causal, 32, 32, key_valid=kvalid_j)
            return (o * g_out).sum()

        def loss_ref(q, k, v):
            mask = kvalid_j[:, None, None, :]
            if causal:
                mask = mask & jnp.tril(jnp.ones((n, n), bool))[None, None]
            return (mha(q, k, v, mask=mask) * g_out).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, bb in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
                err_msg=f"d{name} causal={causal}")


def test_sam_flash_bwd_including_rel_grads():
    """SAM backward: dq/dk/dv AND d_rel_h/d_rel_w vs the einsum bias
    formulation (rel grads feed the trainable rel-pos tables)."""
    b, h, d = 1, 2, 16
    gh = gw = 6                      # n = 36, forces padding at bq=128 bucket
    n = gh * gw
    q, k, v = rand(b, h, n, d, seed=30), rand(b, h, n, d, seed=31), \
        rand(b, h, n, d, seed=32)
    rel_h = rand(b, h, n, gh, seed=33)
    rel_w = rand(b, h, n, gw, seed=34)
    g_out = rand(b, h, n, d, seed=35)

    def loss_flash(q, k, v, rh, rw):
        o = sam_flash_attention(q, k, v, rh, rw, (gh, gw))
        return (o * g_out).sum()

    def loss_ref(q, k, v, rh, rw):
        bias = (rh[..., :, None] + rw[..., None, :]).reshape(b, h, n, n)
        return (mha(q, k, v, bias=bias) * g_out).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for name, a, bb in zip(["q", "k", "v", "rel_h", "rel_w"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-5, err_msg=f"d{name}")


def test_flash_train_step_has_no_quadratic_logits():
    """The jaxpr of the flash grad must not contain an [N, N] intermediate —
    the whole point of the backward kernels (VERDICT round-1 Weak #4)."""
    n, d = 512, 32
    q = rand(1, 1, n, d, seed=40)

    def loss(q, k, v):
        return flash_attention(q, k, v, True, 256, 256).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
    quadratic = [v for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars
                 if getattr(v.aval, "shape", None) and
                 tuple(v.aval.shape[-2:]) == (n, n)]
    assert not quadratic, f"found [N,N] intermediates: {quadratic}"


def test_sam_window_attention_matches_einsum():
    from walkgpt_tpu.ops.flash_attention import sam_window_attention
    ws, d = 4, 16
    t = ws * ws
    bw, h = 3, 2
    q, k, v = rand(bw, h, t, d, seed=50), rand(bw, h, t, d, seed=51), \
        rand(bw, h, t, d, seed=52)
    rel_h = rand(bw, h, t, ws, seed=53)
    rel_w = rand(bw, h, t, ws, seed=54)
    got = sam_window_attention(q, k, v, rel_h, rel_w, ws)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(bw, h, t, t)
    ref = mha(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_sam_window_attention_bwd():
    from walkgpt_tpu.ops.flash_attention import sam_window_attention
    ws, d = 3, 8
    t = ws * ws
    bw, h = 2, 2
    q, k, v = rand(bw, h, t, d, seed=60), rand(bw, h, t, d, seed=61), \
        rand(bw, h, t, d, seed=62)
    rel_h = rand(bw, h, t, ws, seed=63)
    rel_w = rand(bw, h, t, ws, seed=64)
    g_out = rand(bw, h, t, d, seed=65)

    def loss_flash(q, k, v, rh, rw):
        return (sam_window_attention(q, k, v, rh, rw, ws) * g_out).sum()

    def loss_ref(q, k, v, rh, rw):
        bias = (rh[..., :, None] + rw[..., None, :]).reshape(bw, h, t, t)
        return (mha(q, k, v, bias=bias) * g_out).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_h, rel_w)
    for name, a, bb in zip(["q", "k", "v", "rel_h", "rel_w"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-5, err_msg=f"d{name}")


def test_sam_encoder_windowed_flash_parity():
    """Full tiny encoder: windowed+global flash path == einsum path, fwd and
    grad (the windowed path now routes through sam_window_attention)."""
    from walkgpt_tpu.core.config import SAM_VIT_TINY
    from walkgpt_tpu.models import sam_encoder
    params = sam_encoder.init(jax.random.PRNGKey(2), SAM_VIT_TINY)
    for blk in params["blocks"]:
        if "rel_pos_h" in blk:
            blk["rel_pos_h"] = 0.07 * jnp.arange(
                blk["rel_pos_h"].size, dtype=jnp.float32).reshape(
                blk["rel_pos_h"].shape)
            blk["rel_pos_w"] = -0.03 * jnp.arange(
                blk["rel_pos_w"].size, dtype=jnp.float32).reshape(
                blk["rel_pos_w"].shape)
    x = rand(2, 64, 64, 3, seed=70)
    ref = sam_encoder.apply(params, SAM_VIT_TINY, x, use_flash=False)
    got = sam_encoder.apply(params, SAM_VIT_TINY, x, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4,
                               atol=5e-5)

    def loss(params, flash):
        return sam_encoder.apply(params, SAM_VIT_TINY, x,
                                 use_flash=flash).sum()

    gf = jax.grad(lambda p: loss(p, True))(params)
    gr = jax.grad(lambda p: loss(p, False))(params)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4)


def test_flash_bwd_fully_masked_row_bounded():
    """A batch row whose key_valid is ALL False must produce bounded (uniform
    1/M-probability) gradients, not the unnormalized p~1 garbage of
    exp(NEG_INF - NEG_INF) per position (code-review r2 finding)."""
    b, h, n, d = 2, 1, 32, 8
    q, k, v = rand(b, h, n, d, seed=80), rand(b, h, n, d, seed=81), \
        rand(b, h, n, d, seed=82)
    kvalid = np.ones((b, n), bool)
    kvalid[1, :] = False                      # fully masked row
    kvalid_j = jnp.asarray(kvalid)
    g_out = rand(b, h, n, d, seed=83)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, False, 16, 16,
                                key_valid=kvalid_j) * g_out).sum()

    def loss_ref(q, k, v):
        return (mha(q, k, v, mask=kvalid_j[:, None, None, :]) * g_out).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # masked-row grads must stay bounded like the reference's uniform softmax
    for name, a, bb in zip("qkv", gf, gr):
        assert float(jnp.abs(a).max()) < 10.0, f"d{name} blew up"
    # the valid row's grads still match exactly
    for name, a, bb in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(bb[0]),
                                   rtol=2e-4, atol=2e-5, err_msg=f"d{name}")


def test_sam_window_attention_packed_matches_split():
    """Packed-layout kernel (unsplit qkv + packed rel) == split-layout kernel,
    forward and gradients."""
    from walkgpt_tpu.ops.flash_attention import (sam_window_attention,
                                                 sam_window_attention_packed)
    ws, d, h = 4, 16, 3
    t = ws * ws
    bw = 2
    c = h * d
    qkv = rand(bw, t, 3 * c, seed=80)
    rel = rand(bw, t, 2 * h * ws, seed=81)
    g_out = rand(bw, t, c, seed=82)

    def split(x):                       # [bw, t, h*d] -> [bw, h, t, d]
        return x.reshape(bw, t, h, d).transpose(0, 2, 1, 3)

    q, k, v = (split(qkv[:, :, i * c:(i + 1) * c]) for i in range(3))
    rh = rel[:, :, :h * ws].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)
    rw = rel[:, :, h * ws:].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)

    got = sam_window_attention_packed(qkv, rel, h, d, ws)
    ref = sam_window_attention(q, k, v, rh, rw, ws)
    ref_merged = ref.transpose(0, 2, 1, 3).reshape(bw, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_merged),
                               rtol=2e-5, atol=2e-5)

    def loss_packed(qkv, rel):
        return (sam_window_attention_packed(qkv, rel, h, d, ws) * g_out).sum()

    def loss_split(qkv, rel):
        q, k, v = (split(qkv[:, :, i * c:(i + 1) * c]) for i in range(3))
        rh = rel[:, :, :h * ws].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)
        rw = rel[:, :, h * ws:].reshape(bw, t, h, ws).transpose(0, 2, 1, 3)
        out = sam_window_attention(q, k, v, rh, rw, ws)
        return (out.transpose(0, 2, 1, 3).reshape(bw, t, c) * g_out).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1))(qkv, rel)
    gs = jax.grad(loss_split, argnums=(0, 1))(qkv, rel)
    for name, a, b in zip(["qkv", "rel"], gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=f"d{name}")


def test_decode_attention_matches_mha():
    """Fused flat-cache decode kernel == masked mha, incl. GQA repeat."""
    from walkgpt_tpu.ops.flash_attention import decode_attention
    b, h, n_kv, d, l = 2, 4, 2, 8, 16
    q = rand(b, h, d, seed=90)
    k = rand(b, l, n_kv * d, seed=91)
    v = rand(b, l, n_kv * d, seed=92)
    mask = jnp.arange(l)[None, :] < jnp.array([[5], [11]])
    got = decode_attention(q.reshape(b, h * d), k[None], v[None], mask,
                           n_kv=n_kv, layer=0, block=8)
    # reference: split layouts, repeat kv, masked mha
    kh = k.reshape(b, l, n_kv, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, l, n_kv, d).transpose(0, 2, 1, 3)
    rep = h // n_kv
    kh = jnp.repeat(kh, rep, axis=1)
    vh = jnp.repeat(vh, rep, axis=1)
    ref = mha(q[:, :, None], kh, vh, mask=mask[:, None, None, :])[:, :, 0]
    np.testing.assert_allclose(np.asarray(got).reshape(b, h, d),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("qdot8,pv8", [(False, False), (True, False),
                                       (True, True)])
def test_decode_attention_q_matches_dequantized_mha(qdot8, pv8):
    """decode_attention_q (int8 and packed-int4 flat cache, in-VMEM dequant
    + scale folding) == mha over the explicitly dequantized cache — with
    both the bf16 and the int8-MXU (per-head-quantized q) scores dots."""
    from walkgpt_tpu.ops.flash_attention import decode_attention_q
    from walkgpt_tpu.models.llm import _quant_rows, _quant_pack4_flat
    b, h, n_kv, d, l = 2, 4, 2, 8, 16
    q = rand(b, h, d, seed=95)
    k = rand(b, l, n_kv, d, seed=96)
    v = rand(b, l, n_kv, d, seed=97)
    mask = jnp.arange(l)[None, :] < jnp.array([[5], [11]])
    rep = h // n_kv
    kd = n_kv * d
    for pack4 in (False, True):
        if pack4:
            kq, ks = _quant_pack4_flat(k)        # [B, L, kd/2], [B, L, n_kv]
            vq, vs = _quant_pack4_flat(v)

            # dequant reference: global-halves unpack back to [B, L, n_kv, D]
            def unpack(z):
                z32 = np.asarray(z).astype(np.int32)
                lo = ((z32 << 28) >> 28).astype(np.float32)
                hi = (z32 >> 4).astype(np.float32)
                return np.concatenate([lo, hi], axis=-1).reshape(
                    z.shape[:-1] + (n_kv, d))
            kd_ref = unpack(kq) * np.asarray(ks, np.float32)[..., None]
            vd_ref = unpack(vq) * np.asarray(vs, np.float32)[..., None]
            width = kd // 2
        else:
            kq, ks = _quant_rows(k, jnp.int8)
            vq, vs = _quant_rows(v, jnp.int8)
            kd_ref = np.asarray(kq, np.float32) * np.asarray(ks, np.float32)
            vd_ref = np.asarray(vq, np.float32) * np.asarray(vs, np.float32)
            ks, vs = ks[..., 0], vs[..., 0]
            width = kd
        # buffers in cache layout: values [1, B, L, width] int8,
        # scales [1, B, n_kv, L]
        kbuf = jnp.asarray(kq).reshape(b, l, width)[None]
        vbuf = jnp.asarray(vq).reshape(b, l, width)[None]
        ksb = jnp.asarray(ks).transpose(0, 2, 1)[None]
        vsb = jnp.asarray(vs).transpose(0, 2, 1)[None]
        got = decode_attention_q(q.reshape(b, h * d), kbuf, ksb, vbuf, vsb,
                                 mask, n_kv=n_kv, head_dim=d, pack4=pack4,
                                 layer=0, block=8, qdot_int8=qdot8,
                                 pv_int8=pv8)
        kh = jnp.asarray(kd_ref).transpose(0, 2, 1, 3)      # [B, n_kv, L, D]
        vh = jnp.asarray(vd_ref).transpose(0, 2, 1, 3)
        ref = mha(q[:, :, None], jnp.repeat(kh, rep, 1), jnp.repeat(vh, rep, 1),
                  mask=mask[:, None, None, :])[:, :, 0]
        np.testing.assert_allclose(np.asarray(got).reshape(b, h, d),
                                   np.asarray(ref), rtol=2e-2, atol=2e-2,
                                   err_msg=f"pack4={pack4}")


def test_decode_attention_q_valid_len_early_exit():
    """valid_len (traced) clamps streaming to ceil(valid_len/block) blocks;
    blocks past it must not contribute even if key_mask marked them valid."""
    from walkgpt_tpu.ops.flash_attention import decode_attention_q
    from walkgpt_tpu.models.llm import _quant_rows
    b, h, n_kv, d, l = 2, 4, 2, 8, 32
    q = rand(b, h, d, seed=98)
    k = rand(b, l, n_kv, d, seed=99)
    v = rand(b, l, n_kv, d, seed=100)
    kq, ks = _quant_rows(k, jnp.int8)
    vq, vs = _quant_rows(v, jnp.int8)
    kbuf = jnp.asarray(kq).reshape(b, l, n_kv * d)[None]
    vbuf = jnp.asarray(vq).reshape(b, l, n_kv * d)[None]
    ksb = jnp.asarray(ks[..., 0]).transpose(0, 2, 1)[None]
    vsb = jnp.asarray(vs[..., 0]).transpose(0, 2, 1)[None]
    lens = jnp.array([[5], [11]])
    mask = jnp.arange(l)[None, :] < lens

    @jax.jit
    def run(vl):
        return decode_attention_q(q.reshape(b, h * d), kbuf, ksb, vbuf, vsb,
                                  mask, n_kv=n_kv, head_dim=d, layer=0,
                                  block=8, valid_len=vl)

    full = run(jnp.int32(l))            # streams every block
    early = run(jnp.int32(11))          # blocks >= ceil(11/8)=2 skipped
    np.testing.assert_allclose(np.asarray(full), np.asarray(early),
                               rtol=1e-5, atol=1e-5)
    # poison the cache beyond valid_len AND mark it key-valid: with
    # valid_len=11 the poisoned tail must still be unread
    kbuf2 = kbuf.at[:, :, 16:].set(127)
    vbuf2 = vbuf.at[:, :, 16:].set(127)
    mask2 = mask | (jnp.arange(l)[None, :] >= 16)

    got = jax.jit(lambda: decode_attention_q(
        q.reshape(b, h * d), kbuf2, ksb, vbuf2, vsb, mask2, n_kv=n_kv,
        head_dim=d, layer=0, block=8, valid_len=jnp.int32(11)))()
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_greedy_generate_fused_decode_parity():
    """fused_decode=True (flat cache + Pallas decode attention) emits the
    same tokens as the heads-layout path."""
    import dataclasses
    from walkgpt_tpu.core.config import LLAMA_TINY
    from walkgpt_tpu.models import llm
    from walkgpt_tpu.runtime.generate import greedy_generate
    params = llm.init(jax.random.PRNGKey(0), LLAMA_TINY)
    emb = rand(2, 7, LLAMA_TINY.hidden_size, seed=93)
    mask = jnp.array([[True] * 7, [True] * 5 + [False] * 2])
    ref = greedy_generate(params, LLAMA_TINY, emb, mask, max_new_tokens=6,
                          eos_id=-1)
    cfg_f = dataclasses.replace(LLAMA_TINY, fused_decode=True)
    got = greedy_generate(params, cfg_f, emb, mask, max_new_tokens=6,
                          eos_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_allclose(np.asarray(ref.pred_hidden),
                               np.asarray(got.pred_hidden), rtol=2e-4,
                               atol=2e-5)


def test_fused_layer_tail_matches_unfused():
    """ops/fused_layer.fused_layer_tail (one-launch attention + o-proj +
    residual + RMSNorm + int4 MLP; opt-in EXPERIMENT, measured slower than
    the unfused path on v5e) matches the unfused int4x decode sequence."""
    from walkgpt_tpu.core import nn
    from walkgpt_tpu.models.llm import _quant_rows, _quant_pack4_flat
    from walkgpt_tpu.ops import int4 as int4_lib
    from walkgpt_tpu.ops import quant as quant_lib
    from walkgpt_tpu.ops.flash_attention import banded_q8, decode_attention_q
    from walkgpt_tpu.ops.fused_layer import fused_layer_tail
    from walkgpt_tpu.ops.int4 import fused_mlp_int4

    rng = np.random.RandomState(0)
    b, h, n_kv, d, l = 2, 2, 2, 8, 16
    hd = h * d
    i_dim = 32
    x = jnp.asarray(rng.randn(b, hd) * 0.1, jnp.bfloat16)
    q = jnp.asarray(rng.randn(b, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, n_kv, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, n_kv, d), jnp.float32)
    mask = jnp.arange(l)[None, :] < jnp.array([[5], [11]])
    o_p = quant_lib.convert_proj(
        {"w": jnp.asarray(rng.randn(hd, hd) * 0.05, jnp.float32)}, True)
    pn = jnp.asarray(1.0 + 0.1 * rng.randn(hd), jnp.float32)
    mlp_p = {
        "gate": int4_lib.quantize_weight4(
            jnp.asarray(rng.randn(hd, i_dim) * 0.05, jnp.float32)),
        "up": int4_lib.quantize_weight4(
            jnp.asarray(rng.randn(hd, i_dim) * 0.05, jnp.float32)),
        "down": int4_lib.pack_down4(
            jnp.asarray(rng.randn(i_dim, hd) * 0.05, jnp.float32)),
    }
    for pack4 in (False, True):
        if pack4:
            kq, ks = _quant_pack4_flat(k)
            vq, vs = _quant_pack4_flat(v)
            width = n_kv * d // 2
        else:
            kq, ks = _quant_rows(k, jnp.int8)
            vq, vs = _quant_rows(v, jnp.int8)
            ks, vs = ks[..., 0], vs[..., 0]
            width = n_kv * d
        kbuf = jnp.asarray(kq).reshape(b, l, width)[None]
        vbuf = jnp.asarray(vq).reshape(b, l, width)[None]
        ksb = jnp.asarray(ks).transpose(0, 2, 1)[None]
        vsb = jnp.asarray(vs).transpose(0, 2, 1)[None]
        att = decode_attention_q(
            q.reshape(b, hd).astype(jnp.bfloat16), kbuf, ksb, vbuf, vsb,
            mask, n_kv=n_kv, head_dim=d, pack4=pack4, layer=0, block=8,
            qdot_int8=True)
        x2 = x + nn.linear(o_p, att)
        hn = nn.rms_norm({"scale": pn}, x2, eps=1e-6)
        y_ref = x2 + fused_mlp_int4(mlp_p, hn, "silu").astype(x.dtype)
        qb8, qs8 = banded_q8(q.reshape(b, hd), n_kv=n_kv, head_dim=d)
        y = fused_layer_tail(x, qb8, qs8, kbuf, ksb, vbuf, vsb, mask, o_p,
                             pn, mlp_p, n_kv=n_kv, head_dim=d, pack4=pack4,
                             layer=0, act="silu", norm_eps=1e-6, block=8)
        a = np.asarray(y, np.float32)
        r = np.asarray(y_ref, np.float32)
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 2e-2, (pack4, rel)


@pytest.mark.parametrize("pack4", [False, True])
@pytest.mark.parametrize("n_kv", [2, 4])
def test_decode_attention_q_chunk_matches_dequantized_mha(pack4, n_kv):
    """Chunk variant of the banded quantized decode kernel (speculative
    verification): Tc query tokens over the flat int8/int4 cache == causal
    masked mha over the explicitly dequantized cache, with per-row cache
    lengths and the within-chunk causal rule."""
    from walkgpt_tpu.ops.flash_attention import decode_attention_q_chunk
    from walkgpt_tpu.models.llm import _quant_rows, _quant_pack4_flat
    b, h, d, l, tc = 2, 4, 8, 24, 3
    kd = n_kv * d
    rep = h // n_kv
    q = rand(b, tc, h * d, seed=110)
    k = rand(b, l, n_kv, d, seed=111)
    v = rand(b, l, n_kv, d, seed=112)
    cache_len = jnp.array([4, 9], jnp.int32)    # pre-chunk lengths per row
    if pack4:
        kq, ks = _quant_pack4_flat(k)
        vq, vs = _quant_pack4_flat(v)

        def unpack(z):
            z32 = np.asarray(z).astype(np.int32)
            lo = ((z32 << 28) >> 28).astype(np.float32)
            hi = (z32 >> 4).astype(np.float32)
            return np.concatenate([lo, hi], axis=-1).reshape(
                z.shape[:-1] + (n_kv, d))
        kd_ref = unpack(kq) * np.asarray(ks, np.float32)[..., None]
        vd_ref = unpack(vq) * np.asarray(vs, np.float32)[..., None]
        width = kd // 2
    else:
        kq, ks = _quant_rows(k, jnp.int8)
        vq, vs = _quant_rows(v, jnp.int8)
        kd_ref = np.asarray(kq, np.float32) * np.asarray(ks, np.float32)
        vd_ref = np.asarray(vq, np.float32) * np.asarray(vs, np.float32)
        ks, vs = ks[..., 0], vs[..., 0]
        width = kd
    kbuf = jnp.asarray(kq).reshape(b, l, width)[None]
    vbuf = jnp.asarray(vq).reshape(b, l, width)[None]
    ksb = jnp.asarray(ks).transpose(0, 2, 1)[None]
    vsb = jnp.asarray(vs).transpose(0, 2, 1)[None]
    got = decode_attention_q_chunk(q, kbuf, ksb, vbuf, vsb, cache_len,
                                   n_kv=n_kv, head_dim=d, pack4=pack4,
                                   layer=0, block=8)
    # reference: causal mask pos < cl + t + 1 per (row, chunk position)
    kh = jnp.asarray(kd_ref).transpose(0, 2, 1, 3)
    vh = jnp.asarray(vd_ref).transpose(0, 2, 1, 3)
    pos = jnp.arange(l)[None, None, :]
    tt = jnp.arange(tc)[None, :, None]
    mask = pos < cache_len[:, None, None] + tt + 1       # [B, Tc, L]
    qh = q.reshape(b, tc, h, d).transpose(0, 2, 1, 3)    # [B, H, Tc, D]
    ref = mha(qh, jnp.repeat(kh, rep, 1), jnp.repeat(vh, rep, 1),
              mask=mask[:, None])                        # [B, H, Tc, D]
    got_h = np.asarray(got).reshape(b, tc, h, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got_h, np.asarray(ref), rtol=2e-2, atol=2e-2)
