import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.models.projectors import tiny_xattn_init
from walkgpt_tpu.ops.losses import (cross_entropy_with_smoothing, dice_loss,
                                    infonce_loss, overlap_loss, sigmoid_ce_loss)


def _sigmoid(x): return 1.0 / (1.0 + np.exp(-x))


def test_dice_loss_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 4, 5).astype(np.float32)
    t = (rng.rand(3, 4, 5) > 0.5).astype(np.float32)
    got = float(dice_loss(jnp.array(x), jnp.array(t), num_masks=3))
    p = _sigmoid(x).reshape(3, -1) / 1000.0
    tt = t.reshape(3, -1)
    num = 2 * (p * tt).sum(-1)
    den = p.sum(-1) + (tt / 1000.0).sum(-1)
    ref = (1 - (num + 1e-6) / (den + 1e-6)).sum() / (3 + 1e-8)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sigmoid_ce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 6).astype(np.float32)
    t = (rng.rand(2, 4, 6) > 0.5).astype(np.float32)
    got = float(sigmoid_ce_loss(jnp.array(x), jnp.array(t), num_masks=2))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="none")
    ref = float(ref.flatten(1, 2).mean(1).sum() / (2 + 1e-8))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_losses_with_validity_mask():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 3, 3).astype(np.float32)
    t = (rng.rand(4, 3, 3) > 0.5).astype(np.float32)
    full = float(sigmoid_ce_loss(jnp.array(x[:2]), jnp.array(t[:2]), num_masks=2))
    masked = float(sigmoid_ce_loss(jnp.array(x), jnp.array(t), num_masks=2,
                                   valid=jnp.array([True, True, False, False])))
    np.testing.assert_allclose(full, masked, rtol=1e-6)
    full_d = float(dice_loss(jnp.array(x[:2]), jnp.array(t[:2]), num_masks=2))
    masked_d = float(dice_loss(jnp.array(x), jnp.array(t), num_masks=2,
                               valid=jnp.array([True, True, False, False])))
    np.testing.assert_allclose(full_d, masked_d, rtol=1e-6)


def test_infonce_loss_against_numpy_oracle():
    rng = np.random.RandomState(3)
    M, rows, N, D = 4, 3, 6, 8
    pred = rng.randn(M, D).astype(np.float32)
    sam = rng.randn(rows, N, D).astype(np.float32)
    row_ids = np.array([0, 0, 1, 2])
    tx = tiny_xattn_init(jax.random.PRNGKey(0), d=D)
    got = float(infonce_loss(jnp.array(pred), jnp.array(sam),
                             jnp.array(row_ids), tx, top_k=None,
                             temperature=0.07))

    # independent numpy oracle
    wq = np.asarray(tx["wq"]["w"]); wk = np.asarray(tx["wk"]["w"])
    wv = np.asarray(tx["wv"]["w"]); wo = np.asarray(tx["out"]["w"])
    kv = sam[row_ids]
    lg = np.einsum("md,mnd->mn", pred @ wq, kv @ wk) / np.sqrt(D)
    a = np.exp(lg - lg.max(-1, keepdims=True)); a /= a.sum(-1, keepdims=True)
    vpos = np.einsum("mn,mnd->md", a, kv @ wv) @ wo

    def l2(v): return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    z, vp = l2(pred), l2(vpos)
    pos = (z * vp).sum(-1, keepdims=True)
    vall = l2(sam.reshape(-1, D))
    sim = z @ vall.T
    col_rows = np.repeat(np.arange(rows), N)
    sim[row_ids[:, None] == col_rows[None, :]] = -np.inf
    logits = np.concatenate([pos, sim], 1) / 0.07
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1)
    ref = float((lse - logits[:, 0]).mean())
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_infonce_topk_and_mask():
    rng = np.random.RandomState(4)
    pred = jnp.array(rng.randn(6, 8), jnp.float32)
    sam = jnp.array(rng.randn(2, 10, 8), jnp.float32)
    rows = jnp.array([0, 0, 0, 1, 1, 1])
    tx = tiny_xattn_init(jax.random.PRNGKey(1), d=8)
    # masked version over first 4 == unmasked over those 4
    full = float(infonce_loss(pred[:4], sam, rows[:4], tx, top_k=3))
    masked = float(infonce_loss(pred, sam, jnp.where(jnp.arange(6) < 4, rows, 0),
                                tx, top_k=3,
                                valid=jnp.arange(6) < 4))
    np.testing.assert_allclose(full, masked, rtol=1e-5)


def test_infonce_single_row_no_exclusion():
    rng = np.random.RandomState(5)
    pred = jnp.array(rng.randn(2, 8), jnp.float32)
    sam = jnp.array(rng.randn(1, 5, 8), jnp.float32)
    tx = tiny_xattn_init(jax.random.PRNGKey(2), d=8)
    loss = float(infonce_loss(pred, sam, jnp.zeros(2, jnp.int32), tx,
                              exclude_same_row=False))
    assert np.isfinite(loss)


def test_overlap_loss_zero_when_no_overlap():
    x = jnp.array([[[-5.0, 5.0], [-5.0, -5.0]],
                   [[-5.0, -5.0], [5.0, -5.0]]])   # disjoint positives
    t = (x > 0).astype(jnp.float32)
    out = float(overlap_loss(x, t, num_masks=2,
                             batch_seg_token_count=jnp.array([2])))
    assert out == 0.0
    # overlapping positives -> positive loss against zero targets
    x2 = jnp.full((2, 2, 2), 5.0)
    t2 = jnp.zeros((2, 2, 2))
    out2 = float(overlap_loss(x2, t2, num_masks=2,
                              batch_seg_token_count=jnp.array([2])))
    assert out2 > 0


def test_cross_entropy_smoothing_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(6)
    logits = rng.randn(10, 7).astype(np.float32)
    labels = rng.randint(0, 7, 10)
    labels[3] = -100
    labels[8] = -100
    got = float(cross_entropy_with_smoothing(jnp.array(logits), jnp.array(labels)))
    ref = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels).long(),
        ignore_index=-100, label_smoothing=0.1))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
