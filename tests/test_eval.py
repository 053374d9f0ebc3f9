import numpy as np
import pytest

import jax.numpy as jnp

from walkgpt_tpu.eval.matcher import (batch_bce_cost, batch_dice_cost,
                                      grid_sample_bilinear, match_pred)
from walkgpt_tpu.eval.metrics import (AverageMeter, IoUAccumulator,
                                      intersection_and_union)


def test_intersection_and_union_matches_torch_histc():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    out = rng.randint(0, 2, (13, 17))
    tgt = rng.randint(0, 2, (13, 17))
    tgt[0, :5] = 255
    inter, union, area_t = intersection_and_union(out, tgt, 2, 255)

    o = torch.from_numpy(out.copy()).view(-1).float()
    t = torch.from_numpy(tgt.copy()).view(-1).float()
    o[t == 255] = 255
    i_ref = torch.histc(o[o == t], bins=2, min=0, max=1)
    a_o = torch.histc(o, bins=2, min=0, max=1)
    a_t = torch.histc(t, bins=2, min=0, max=1)
    np.testing.assert_array_equal(inter, i_ref.numpy())
    np.testing.assert_array_equal(union, (a_o + a_t - i_ref).numpy())
    np.testing.assert_array_equal(area_t, a_t.numpy())


def test_iou_accumulator_basic():
    acc = IoUAccumulator()
    pred = np.zeros((10, 10), np.int64)
    pred[:5] = 1
    gt = np.zeros((10, 10), np.int64)
    gt[:5] = 1
    acc.add_mask(pred, gt)              # perfect
    acc.add_mask(1 - pred, gt)          # inverted -> fg IoU 0
    r = acc.results()
    np.testing.assert_allclose(r["giou"], 0.5, atol=1e-4)
    np.testing.assert_allclose(r["ap50"], 0.5, atol=1e-6)
    assert r["n_masks"] == 2.0


def test_iou_accumulator_no_object_rule():
    acc = IoUAccumulator()
    empty = np.zeros((4, 4), np.int64)
    acc.add_mask(empty, empty)          # union == 0 for fg -> giou += 1
    r = acc.results()
    np.testing.assert_allclose(r["giou"], 1.0, atol=1e-4)


def test_average_meter():
    m = AverageMeter("t", ":.2f")
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.count == 4
    np.testing.assert_allclose(m.avg, 3.5)
    assert "t" in str(m) and "3.50" in str(m)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    img = rng.randn(3, 9, 11).astype(np.float32)
    pts = rng.rand(50, 2).astype(np.float32)
    coords = 2.0 * pts - 1.0
    got = np.asarray(grid_sample_bilinear(jnp.array(img), jnp.array(coords)))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img)[:, None],
        torch.from_numpy(coords)[None, :, None, :].repeat(3, 1, 1, 1),
        align_corners=False).squeeze(3).squeeze(1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_batch_costs_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(3, 40).astype(np.float32)
    t = (rng.rand(4, 40) > 0.5).astype(np.float32)
    got_bce = np.asarray(batch_bce_cost(jnp.array(x), jnp.array(t)))
    xt, tt = torch.from_numpy(x), torch.from_numpy(t)
    pos = torch.nn.functional.binary_cross_entropy_with_logits(
        xt, torch.ones_like(xt), reduction="none")
    neg = torch.nn.functional.binary_cross_entropy_with_logits(
        xt, torch.zeros_like(xt), reduction="none")
    ref_bce = (torch.einsum("nc,mc->nm", pos, tt)
               + torch.einsum("nc,mc->nm", neg, 1 - tt)) / 40
    np.testing.assert_allclose(got_bce, ref_bce.numpy(), rtol=1e-4, atol=1e-5)

    got_dice = np.asarray(batch_dice_cost(jnp.array(x), jnp.array(t)))
    p = torch.sigmoid(xt)
    num = 2 * torch.einsum("nc,mc->nm", p, tt)
    den = p.sum(-1)[:, None] + tt.sum(-1)[None, :]
    ref_dice = 1 - (num + 1) / (den + 1)
    np.testing.assert_allclose(got_dice, ref_dice.numpy(), rtol=1e-4, atol=1e-5)


def test_match_pred_recovers_permutation():
    rng = np.random.RandomState(3)
    # 3 disjoint GT masks
    gt = np.zeros((3, 32, 32), np.float32)
    gt[0, :10], gt[1, 11:20], gt[2, 21:] = 1, 1, 1
    # predictions are shuffled strong logits of the same masks
    perm = [2, 0, 1]
    pred = np.stack([20.0 * (gt[p] - 0.5) for p in perm])
    pi, ti = match_pred(pred, gt)
    mapping = dict(zip(pi.tolist(), ti.tolist()))
    assert mapping == {0: 2, 1: 0, 2: 1}


def test_eval_cli_smoke(tmp_path):
    """End-to-end CLI on the real reference manifest (tiny model, 1 sample)."""
    import os
    if not os.path.exists("/root/reference/datasets/val.jsonl"):
        pytest.skip("reference manifest absent")
    from walkgpt_tpu.runtime.evaluate import main
    out = str(tmp_path / "responses.json")
    res = main(["--val_dataset", "PAVE|val",
                "--dataset_dir", "/root/reference/datasets",
                "--model_size", "tiny", "--max_samples", "1",
                "--max_new_tokens", "4", "--precision", "fp32",
                "--no_console_text",
                "--save_responses_path", out])
    assert set(res) >= {"giou", "ciou", "ap50"}
    import json
    data = json.load(open(out))
    assert len(data) == 1
    assert data[0]["response"].startswith("Question: ")
    assert "| Answer:" in data[0]["response"]
