"""Evaluation metrics with the reference's exact semantics.

  * intersection_and_union — histogram IoU incl. ignore-index handling
    (utils/utils.py:192-204): predictions at ignored target pixels are
    rewritten to ignore_index before the histograms;
  * gIoU accumulation uses the no-object rule giou += 1 when union == 0
    (train_walkgpt.py:1230-1233 / evaluation_walkgpt.py:949-952);
  * AverageMeter with cross-host all_reduce (utils/utils.py:128-174) —
    TPU-native: the reduction sums over jax process replicas via
    multihost_utils when running multi-host, and is a no-op locally;
  * accumulations are float64 on host, matching the reference's explicit
    float64 all_reduces (train_walkgpt.py:1259-1263).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import numpy as np


def intersection_and_union(output: np.ndarray, target: np.ndarray, k: int,
                           ignore_index: int = 255
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """output/target: integer arrays of identical shape, values in [0, K).
    Returns (intersection, union, target_area) histograms of length K."""
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1)
    output[target == ignore_index] = ignore_index
    inter = output[output == target]
    bins = np.arange(k + 1) - 0.5
    area_inter = np.histogram(inter, bins=bins)[0]
    area_out = np.histogram(output, bins=bins)[0]
    area_tgt = np.histogram(target, bins=bins)[0]
    return (area_inter.astype(np.float64),
            (area_out + area_tgt - area_inter).astype(np.float64),
            area_tgt.astype(np.float64))


@dataclasses.dataclass
class IoUAccumulator:
    """Streaming gIoU / cIoU over per-mask binary {bg, fg} comparisons with the
    reference accumulation rules."""
    num_classes: int = 2
    ignore_index: int = 255

    def __post_init__(self):
        self.inter_total = np.zeros(self.num_classes, np.float64)
        self.union_total = np.zeros(self.num_classes, np.float64)
        self.giou_sum = np.zeros(self.num_classes, np.float64)
        self.giou_count = np.zeros(self.num_classes, np.float64)
        self.tp = 0.0           # AP50 bookkeeping: fg IoU >= 0.5
        self.n_masks = 0.0

    def add_mask(self, pred_binary: np.ndarray, gt_binary: np.ndarray) -> None:
        inter, union, _ = intersection_and_union(
            pred_binary.astype(np.int64), gt_binary.astype(np.int64),
            self.num_classes, self.ignore_index)
        self.inter_total += inter
        self.union_total += union
        giou = inter / (union + 1e-5)
        giou[union == 0] += 1.0          # no-object rule
        self.giou_sum += giou
        self.giou_count += 1.0
        fg_iou = inter[1] / (union[1] + 1e-10)
        self.tp += float(fg_iou >= 0.5 and union[1] > 0)
        self.n_masks += 1.0

    def all_reduce(self) -> None:
        """Sum accumulators across JAX processes (multi-host eval)."""
        import jax
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        stacked = np.concatenate([self.inter_total, self.union_total,
                                  self.giou_sum, self.giou_count,
                                  [self.tp, self.n_masks]])
        reduced = multihost_utils.process_allgather(stacked).sum(axis=0)
        k = self.num_classes
        self.inter_total = reduced[0:k]
        self.union_total = reduced[k:2 * k]
        self.giou_sum = reduced[2 * k:3 * k]
        self.giou_count = reduced[3 * k:4 * k]
        self.tp, self.n_masks = reduced[4 * k], reduced[4 * k + 1]

    def results(self) -> dict:
        iou_class = self.inter_total / (self.union_total + 1e-10)
        giou_class = self.giou_sum / (self.giou_count + 1e-10)
        miou_incl = float(iou_class.mean())
        return {
            "ciou": float(iou_class[1]),
            "giou": float(giou_class[1]),
            "miou_inclusive": miou_incl,
            "miou_exclusive": float(iou_class[1:].mean()),
            "ap50": float(self.tp / (self.n_masks + 1e-10)),
            "recall": float(self.tp / (self.n_masks + 1e-10)),
            "n_masks": float(self.n_masks),
        }


class Summary(enum.Enum):
    NONE = 0
    AVERAGE = 1
    SUM = 2
    COUNT = 3


class AverageMeter:
    """utils/utils.py:128-174 semantics, numpy/JAX-native all_reduce."""

    def __init__(self, name: str, fmt: str = ":f",
                 summary_type: Summary = Summary.AVERAGE):
        self.name = name
        self.fmt = fmt
        self.summary_type = summary_type
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum = self.sum + val * n
        self.count += n
        self.avg = self.sum / self.count

    def all_reduce(self):
        import jax
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        arr = np.asarray(self.sum, np.float64).reshape(-1)
        total = np.concatenate([arr, [float(self.count)]])
        reduced = multihost_utils.process_allgather(total).sum(axis=0)
        if reduced.shape[0] > 2:
            self.sum, self.count = reduced[:-1], float(reduced[-1])
        else:
            self.sum, self.count = float(reduced[0]), float(reduced[1])
        self.avg = self.sum / (self.count + 1e-5)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)

    def summary(self):
        if self.summary_type is Summary.NONE:
            return ""
        if self.summary_type is Summary.AVERAGE:
            return f"{self.name} {self.avg:.3f}"
        if self.summary_type is Summary.SUM:
            return f"{self.name} {self.sum:.3f}"
        if self.summary_type is Summary.COUNT:
            return f"{self.name} {self.count:.3f}"
        raise ValueError(self.summary_type)


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.batch_fmtstr = self._fmt(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))

    def display_summary(self):
        entries = [" *"] + [m.summary() for m in self.meters]
        print(" ".join(entries))

    @staticmethod
    def _fmt(num_batches: int) -> str:
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"
