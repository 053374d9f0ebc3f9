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


def test_eval_cli_mesh_smoke(tmp_path):
    """--mesh dp,tp streaming eval (BASELINE config 5) on the real manifest:
    BOTH mesh implementations (GSPMD and the manual shard_map tp path —
    --mesh_impl auto picks shard_map at tp>1 on the SAM stream) must
    produce the same responses artifact as the single-device CLI."""
    import json
    import os
    if not os.path.exists("/root/reference/datasets/val.jsonl"):
        pytest.skip("reference manifest absent")
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from walkgpt_tpu.runtime.evaluate import main
    base = ["--val_dataset", "PAVE|val",
            "--dataset_dir", "/root/reference/datasets",
            "--model_size", "tiny", "--max_samples", "2",
            "--max_new_tokens", "4", "--precision", "fp32",
            "--val_batch_size", "2", "--no_console_text"]
    out_1 = str(tmp_path / "single.json")
    main(base + ["--save_responses_path", out_1])
    want = json.load(open(out_1))
    for impl in ("shard_map", "gspmd"):
        out_m = str(tmp_path / f"mesh_{impl}.json")
        res = main(base + ["--mesh", "2,4", "--mesh_impl", impl,
                           "--save_responses_path", out_m])
        assert set(res) >= {"giou", "ciou", "ap50"}
        assert json.load(open(out_m)) == want, impl


def test_iou_accumulator_matches_reference_recomputation():
    """Fixture-match IoUAccumulator against a verbatim torch re-computation of
    the reference's validate() aggregation (train_walkgpt.py:1180-1299):
    per-class float64 totals, giou no-object rule, TP/FP/FN detection
    counters, valid-union mIoU, AP50/Recall inclusive + no-bg variants."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(7)
    pairs = []
    for _ in range(12):
        pred = (rng.rand(16, 16) > 0.5).astype(np.int64)
        gt = (rng.rand(16, 16) > 0.5).astype(np.int64)
        pairs.append((pred, gt))
    pairs.append((np.zeros((16, 16), np.int64), np.zeros((16, 16), np.int64)))
    pairs.append((np.ones((16, 16), np.int64), np.zeros((16, 16), np.int64)))
    pairs.append((np.zeros((16, 16), np.int64), np.ones((16, 16), np.int64)))
    p, g = (rng.rand(16, 16) > 0.4).astype(np.int64), np.zeros((16, 16), np.int64)
    g[:12] = p[:12]                      # high-IoU pair -> TP
    pairs.append((p, g))
    ign = (rng.rand(16, 16) > 0.5).astype(np.int64)
    ign_t = (rng.rand(16, 16) > 0.5).astype(np.int64)
    ign_t[:3] = 255                      # ignore_index region
    pairs.append((ign, ign_t))

    # --- reference re-computation (torch, float64, CPU) -------------------
    def intersectionAndUnionGPU(output, target, K, ignore_index=255):
        output = output.view(-1).clone()
        target = target.view(-1)
        output[target == ignore_index] = ignore_index
        intersection = output[output == target]
        area_intersection = torch.histc(intersection.float(), bins=K, min=0,
                                        max=K - 1)
        area_output = torch.histc(output.float(), bins=K, min=0, max=K - 1)
        area_target = torch.histc(target.float(), bins=K, min=0, max=K - 1)
        area_union = area_output + area_target - area_intersection
        return area_intersection, area_union, area_target

    K = 2
    inter_total = torch.zeros(K, dtype=torch.float64)
    union_total = torch.zeros(K, dtype=torch.float64)
    giou_sum = torch.zeros(K, dtype=torch.float64)
    giou_count = torch.zeros(K, dtype=torch.float64)
    target_total = torch.zeros(K, dtype=torch.float64)
    pred_total = torch.zeros(K, dtype=torch.float64)
    tp_counter = torch.zeros(1, dtype=torch.float64)
    fp_counter = torch.zeros(1, dtype=torch.float64)
    fn_counter = torch.zeros(1, dtype=torch.float64)
    for pred, gt in pairs:
        inter_i, union_i, target_i = intersectionAndUnionGPU(
            torch.from_numpy(pred), torch.from_numpy(gt), K, 255)
        inter_i = inter_i.to(torch.float64)
        union_i = union_i.to(torch.float64)
        target_i = target_i.to(torch.float64)
        pred_i = union_i - target_i + inter_i
        inter_total += inter_i
        union_total += union_i
        target_total += target_i
        pred_total += pred_i
        giou_sample = inter_i / (union_i + 1e-5)
        giou_sample[union_i == 0] += 1.0
        giou_sum += giou_sample
        giou_count += 1.0
        fg_target, fg_pred = target_i[1], pred_i[1]
        if fg_target <= 0 and fg_pred <= 0:
            pass
        elif fg_target <= 0:
            fp_counter += 1
        elif fg_pred <= 0:
            fn_counter += 1
        else:
            fg_iou = inter_i[1] / (union_i[1] + 1e-10)
            if fg_iou >= 0.5:
                tp_counter += 1
            else:
                fp_counter += 1
                fn_counter += 1
    iou_class = inter_total / (union_total + 1e-10)
    giou_class = giou_sum / (giou_count + 1e-10)
    class_ids = torch.arange(K)
    valid_all = union_total > 0
    valid_fg = valid_all & (class_ids != 0)
    want = {
        "ciou": iou_class[1].item(),
        "giou": giou_class[1].item(),
        "miou_inclusive": iou_class[valid_all].mean().item(),
        "miou_exclusive": iou_class[valid_fg].mean().item(),
        "ap50": (tp_counter / (tp_counter + fp_counter + 1e-10)).item(),
        "recall": (tp_counter / (tp_counter + fn_counter + 1e-10)).item(),
        "tp": tp_counter.item(), "fp": fp_counter.item(),
        "fn": fn_counter.item(),
    }
    gt_all = target_total > 0
    pred_all = pred_total > 0
    iou_hits = (iou_class >= 0.5) & gt_all
    fg = class_ids != 0
    tp_fg = (iou_hits & fg).sum().item()
    fn_fg = ((gt_all & fg) & ~iou_hits).sum().item()
    fp_fg = ((pred_all & fg) & ~gt_all).sum().item()
    want["ap50_no_bg"] = tp_fg / (tp_fg + fp_fg + 1e-10) if tp_fg + fp_fg else float("nan")
    want["recall_no_bg"] = tp_fg / (tp_fg + fn_fg + 1e-10) if tp_fg + fn_fg else float("nan")

    # --- ours ---------------------------------------------------------------
    acc = IoUAccumulator()
    for pred, gt in pairs:
        acc.add_mask(pred, gt)
    res = acc.results()
    for key, val in want.items():
        if val != val:
            assert res[key] != res[key], key
        else:
            np.testing.assert_allclose(res[key], val, rtol=1e-12, err_msg=key)
    assert res["tp"] + res["fp"] != 0
    assert res["ap50"] != res["recall"] or res["fp"] == res["fn"]


def test_parse_distance_block():
    from walkgpt_tpu.eval.metrics import parse_distance_block
    text = ("[assessment] ok [/assessment] Accessible features are here: "
            "[p] bench [/p][SEG] [distance] Distance from the user to the "
            "to the bench: 1.5 m; to the tactile paving: 12.0 m. [/distance]")
    d = parse_distance_block(text)
    assert d == {"bench": 1.5, "tactile paving": 12.0}
    assert parse_distance_block("no block here") == {}
    assert parse_distance_block("") == {}


def test_parse_distance_block_from_composer():
    """The parser round-trips our byte-compatible composer output."""
    from walkgpt_tpu.data.pave import LabelMap, compose_answer_text
    import os
    lm_path = "/root/reference/datasets/labelmap.json"
    if not os.path.exists(lm_path):
        pytest.skip("labelmap absent")
    from walkgpt_tpu.eval.metrics import parse_distance_block
    lm = LabelMap.load(lm_path)
    example = {"assessment": "The path is clear.",
               "depth": {"3": 4.2, "7": 1.05}}
    text = compose_answer_text(example, lm)
    parsed = parse_distance_block(text)
    assert len(parsed) == 2
    assert sorted(parsed.values()) == [1.1, 4.2]  # composer renders {d:.1f}


def test_depth_accuracy():
    from walkgpt_tpu.eval.metrics import DepthAccuracy
    depth = DepthAccuracy(rel_tol=0.25, abs_tol=0.25)
    gt = {"bench": 4.0, "pole": 1.0, "curb": 10.0}
    pred = ("[distance] Distance from the user to the to the bench: 4.5 m; "
            "to the pole: 2.5 m. [/distance]")
    depth.update(pred, gt)
    r = depth.results()
    # bench: |4.5-4.0|=0.5 <= max(0.25, 1.0) -> correct
    # pole: |2.5-1.0|=1.5 > 0.25 -> wrong; curb unmatched -> wrong
    np.testing.assert_allclose(r["depth_acc"], 1 / 3)
    np.testing.assert_allclose(r["depth_mae"], (0.5 + 1.5) / 2)
    np.testing.assert_allclose(r["depth_match_rate"], 2 / 3)
    np.testing.assert_allclose(r["depth_block_rate"], 1.0)
    depth.update("no block", {"bench": 1.0})
    r = depth.results()
    np.testing.assert_allclose(r["depth_block_rate"], 0.5)


def test_ar_validate_cli_smoke(tmp_path):
    """End-to-end ar_validate on real MultiReasonSeg-format data (fabricated
    muse_val.json): Hungarian-matched eval through the jitted generate path,
    out_file_{rank}.json artifact, full metric line."""
    import cv2
    import json as _json
    from walkgpt_tpu.data import rle as rle_mod
    from walkgpt_tpu.runtime.evaluate import main

    cv2.imwrite(str(tmp_path / "m0.jpg"),
                np.full((48, 48, 3), 128, np.uint8))
    m = np.zeros((48, 48), np.uint8)
    m[:16] = 1
    items = [{
        "image": "m0.jpg",
        "question": "<image>\nWhat objects are here?",
        "targets": [
            {"name": "roof", "rle": {"size": [48, 48],
                                     "counts": rle_mod.encode(m)["counts"]
                                     .decode("ascii")}},
            {"name": "door", "polygon": [[2, 20], [30, 20], [30, 40], [2, 40]]},
        ],
    }]
    with open(tmp_path / "muse_val.json", "w") as f:
        _json.dump(items, f)

    res = main(["--val_dataset", "MultiReasonSeg|val",
                "--dataset_dir", str(tmp_path),
                "--model_size", "tiny", "--max_samples", "1",
                "--max_new_tokens", "8", "--precision", "fp32",
                "--no_console_text",
                "--log_base_dir", str(tmp_path / "runs"),
                "--exp_name", "ar_smoke"])
    assert set(res) >= {"giou", "ciou", "ap50", "recall", "miou",
                        "target_count_acc"}
    out_file = tmp_path / "runs" / "ar_smoke" / "out_file_0.json"
    records = _json.load(open(out_file))
    assert len(records) == 1
    # acc_list_{rank}.json: per-sample [giou_bg, giou_fg, max_num, image_path]
    # (train_walkgpt.py:841-842, 1090-1093)
    acc_list = _json.load(open(tmp_path / "runs" / "ar_smoke" /
                               "acc_list_0.json"))
    assert len(acc_list) == 1
    bg, fg, max_num, path = acc_list[0]
    assert 0.0 <= bg <= 1.0 and 0.0 <= fg <= 1.0
    assert max_num == max(records[0]["pred_count"], records[0]["gt_count"], 1)
    assert path.endswith("m0.jpg")
    assert 0.0 <= res["target_count_acc"] <= 1.0
    assert records[0]["gt_count"] == 2
    assert "answer" in records[0]


def test_eval_cli_batched_and_clip_stream(tmp_path):
    """--val_batch_size batches BOTH eval passes and --visual_stream clip
    routes generation through the CLIP-448 tower + mm_projector (WART-4's
    second stream, model/walkgpt.py:629-637 intent)."""
    import os
    if not os.path.exists("/root/reference/datasets/val.jsonl"):
        pytest.skip("reference manifest absent")
    from walkgpt_tpu.runtime.evaluate import main
    out = str(tmp_path / "responses.json")
    res = main(["--val_dataset", "PAVE|val",
                "--dataset_dir", "/root/reference/datasets",
                "--model_size", "tiny", "--max_samples", "3",
                "--val_batch_size", "2",
                "--max_new_tokens", "4", "--precision", "fp32",
                "--no_console_text",
                "--save_responses_path", out])
    assert res["images_per_sec"] > 0
    import json
    data = json.load(open(out))
    assert len(data) == 3
    # every record got a real per-image path (no row/image misalignment)
    assert all(d["image_path"] for d in data)

    res_clip = main(["--val_dataset", "PAVE|val",
                     "--dataset_dir", "/root/reference/datasets",
                     "--model_size", "tiny", "--max_samples", "2",
                     "--val_batch_size", "2", "--visual_stream", "clip",
                     "--max_new_tokens", "4", "--precision", "fp32",
                     "--no_console_text"])
    assert set(res_clip) >= {"giou", "ciou", "ap50"}


def test_row_bucketing_is_metric_inert():
    """prepare_batch(row_multiple=8) pads inert conversation rows (one live
    token, labels -100, no [SEG], no sentinel) so eval batches share XLA
    programs; the padded forward must produce IDENTICAL losses, seg
    extraction, and masks to the unpadded one."""
    import jax
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.data import conversation as conv_lib
    from walkgpt_tpu.data.collate import collate_batch
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.runtime.batching import prepare_batch
    from tests.test_walkgpt_model import make_sample

    conv_lib.set_default_conversation("llava_v1")
    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    cfg = tiny_config(seg_token_id=st.seg_token_idx)
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    samples = [make_sample(tok, n_segs=2), make_sample(tok, n_segs=1, q="b?")]
    batch = collate_batch(samples, tok)

    outs = []
    for rm in (1, 8):
        db = prepare_batch(batch, img_size=64, seq_multiple=32,
                           seg_multiple=4, seg_token_id=cfg.seg_token_id,
                           row_multiple=rm)
        if rm > 1:
            assert db.input_ids.shape[0] % rm == 0
            pad_rows = db.input_ids[len(samples[0].conversations)
                                    + len(samples[1].conversations):]
            assert (pad_rows != cfg.seg_token_id).all()
            assert not (pad_rows == -200).any()
        outs.append(walkgpt.model_forward(
            params, cfg, images=jnp.array(db.images),
            input_ids=jnp.array(db.input_ids), labels=jnp.array(db.labels),
            attention_mask=jnp.array(db.attention_mask),
            row_image_idx=jnp.array(db.row_image_idx),
            gt_masks=jnp.array(db.gt_masks), pixel_hw=jnp.array(db.pixel_hw),
            max_segs=db.max_segs))
    a, b = outs
    for name in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss",
                 "nce_loss"):
        np.testing.assert_allclose(float(getattr(a, name)),
                                   float(getattr(b, name)), rtol=2e-5,
                                   err_msg=name)
    assert int(a.seg_valid.sum()) == int(b.seg_valid.sum()) == 3
    na = int(a.seg_valid.sum())
    np.testing.assert_allclose(
        np.asarray(a.pred_masks)[np.asarray(a.seg_valid, bool)][:na],
        np.asarray(b.pred_masks)[np.asarray(b.seg_valid, bool)][:na],
        atol=1e-5)


def test_clip_visual_tokens_shapes_and_mask():
    """clip_visual_tokens: tower tokens -> 16x16-equivalent LLM grid + the
    nearest-downsampled validity mask (llava_arch.py:176-181, 251-259)."""
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.models import walkgpt

    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((2, cfg.clip.image_size, cfg.clip.image_size, 3))
    hw = jnp.array([[28, 28], [14, 28]])   # second image: bottom half padded
    toks, llm_mask = walkgpt.clip_visual_tokens(params, cfg, imgs, hw)
    assert toks.shape == (2, cfg.visual_tokens, cfg.llm.hidden_size)
    assert llm_mask.shape == (2, cfg.visual_tokens)
    m = np.asarray(llm_mask).reshape(2, cfg.visual_grid, cfg.visual_grid)
    assert m[0].all()                      # full image: all tokens valid
    assert m[1, :2].all() and not m[1, 2:].any()   # half-pad: bottom rows off


def test_device_mask_counts_match_host_histograms():
    """device_mask_counts (the transfer-free streaming-eval reduction) must
    reproduce intersection_and_union + the region crop exactly, including
    the ignore_index rule."""
    import jax.numpy as jnp
    from walkgpt_tpu.eval.metrics import (device_mask_counts,
                                          intersection_and_union)

    rng = np.random.RandomState(3)
    s, m = 24, 5
    pred_logits = rng.randn(m, s, s).astype(np.float32)
    gt = (rng.rand(m, s, s) > 0.5).astype(np.float32)
    gt[0, :4, :4] = 255.0                      # ignore region
    row_image_idx = np.array([0, 1, 0], np.int32)
    seg_rows = np.array([0, 1, 2, 2, 1], np.int32)
    pixel_hw = np.array([[20, 24], [16, 10]], np.int64)

    counts = np.asarray(device_mask_counts(
        jnp.asarray(pred_logits), jnp.asarray(gt), jnp.asarray(seg_rows),
        jnp.asarray(row_image_idx), jnp.asarray(pixel_hw)))

    for k in range(m):
        img = int(row_image_idx[seg_rows[k]])
        h, w = pixel_hw[img]
        inter, union, target = intersection_and_union(
            (pred_logits[k, :h, :w] > 0).astype(np.int64),
            gt[k, :h, :w].astype(np.int64), 2, 255)
        np.testing.assert_array_equal(counts[k, 0], inter)
        np.testing.assert_array_equal(counts[k, 1], union)
        np.testing.assert_array_equal(counts[k, 2], target)


def test_parity_cli_record_compare(tmp_path):
    """Real-weight parity harness (BASELINE north star contract): record on
    the real manifest, self-compare passes; a perturbed recording fails."""
    import os
    if not os.path.exists("/root/reference/datasets/val.jsonl"):
        pytest.skip("reference manifest absent")
    import numpy as np
    from walkgpt_tpu.runtime.parity_cli import main as parity_main
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    base = ["--samples", "1", "--dataset_dir", "/root/reference/datasets",
            "--model_size", "tiny", "--max_new_tokens", "4"]
    parity_main(["record", "--out", a] + base)
    parity_main(["record", "--out", b] + base)
    assert parity_main(["compare", "--a", a, "--b", b]) == 0
    d = dict(np.load(b))
    d["tokens_0"] = d["tokens_0"] + 1
    c = str(tmp_path / "c.npz")
    np.savez_compressed(c, **d)
    assert parity_main(["compare", "--a", a, "--b", c]) == 1
