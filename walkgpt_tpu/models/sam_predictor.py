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


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """Per-crop-layer point grids, downscaled by scale_per_layer each layer
    (utils/amg.py build_all_layer_point_grids)."""
    return [build_point_grid(max(int(n_per_side / (scale_per_layer ** i)), 1))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float
                        ) -> Tuple[List[List[int]], List[int]]:
    """Crop boxes per pyramid layer: layer i has (2^i)^2 overlapping boxes
    (utils/amg.py:200-234). Returns (XYXY boxes, layer index per box)."""
    import math
    from itertools import product
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                               min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def is_box_near_crop_edge(boxes: np.ndarray, crop_box: List[int],
                          orig_box: List[int], atol: float = 20.0
                          ) -> np.ndarray:
    """True for boxes that touch the crop boundary but NOT the image boundary
    (those masks are crop artifacts; utils/amg.py is_box_near_crop_edge)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    near_crop = np.isclose(boxes, crop[None], atol=atol, rtol=0)
    near_image = np.isclose(boxes, orig[None], atol=atol, rtol=0)
    return (near_crop & ~near_image).any(axis=1)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str
                         ) -> Tuple[np.ndarray, bool]:
    """Remove small disconnected regions ('islands') or fill small holes
    ('holes') via connected components (utils/amg.py:267-291)."""
    import cv2
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask.astype(bool)).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]               # row 0 is the background label
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask.astype(bool), False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill]
        if not fill:                       # everything small: keep the largest
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


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
    """Grid-prompted whole-image segmentation (automatic_mask_generator.py),
    including the multi-crop pyramid (crop_n_layers: layer i adds (2^i)^2
    overlapping crops, each re-encoded and re-prompted, :189-258) and
    small-region postprocessing (hole fill + island removal + re-NMS,
    :324-372)."""

    def __init__(self, params, cfg: sam_mod.SamConfig, *,
                 points_per_side: int = 32, points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 min_mask_region_area: int = 0):
        self.predictor = SamPredictor(params, cfg)
        self.cfg = cfg
        self.point_grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self._decode_batch = jax.jit(self._decode_points)

    def _decode_points(self, params, features, coords):
        """coords: [N, 2] in model input frame -> per-point multimask decode."""
        points = (coords[:, None, :], jnp.ones((coords.shape[0], 1), jnp.int32))
        low_res, iou = sam_mod.decode_masks(
            params, self.cfg, features, points=points, multimask_output=True)
        return low_res, iou

    def _process_crop(self, image: np.ndarray, crop_box: List[int],
                      layer_idx: int, orig_size: Tuple[int, int]):
        """One crop: encode, grid-prompt, threshold, in-crop NMS, uncrop to
        the full frame (automatic_mask_generator.py:217-258)."""
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1]
        ch, cw = crop.shape[:2]
        oh, ow = orig_size
        self.predictor.set_image(crop)
        ih, iw = self.predictor.input_size
        pts = self.point_grids[layer_idx] * np.array([cw, ch])   # crop frame
        pts_in = self.predictor.transform_coords(pts)

        all_masks, all_iou, all_stab, all_pts = [], [], [], []
        for start in range(0, len(pts_in), self.points_per_batch):
            chunk = jnp.asarray(pts_in[start:start + self.points_per_batch],
                                jnp.float32)
            low_res, iou = self._decode_batch(self.predictor.params,
                                              self.predictor.features, chunk)
            masks_full = sam_mod.postprocess_masks(
                low_res, img_size=self.cfg.encoder.img_size,
                input_size=(ih, iw), original_size=(ch, cw))
            m = np.asarray(masks_full).reshape(-1, ch, cw)
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
        self.predictor.reset_image()

        if not any(len(m) for m in all_masks):
            return None
        masks_c = np.concatenate(all_masks, 0)
        ious = np.concatenate(all_iou, 0)
        stabs = np.concatenate(all_stab, 0)
        points = np.concatenate(all_pts, 0) + np.array([x0, y0])  # uncrop

        # uncrop masks into the full frame
        masks = np.zeros((masks_c.shape[0], oh, ow), bool)
        masks[:, y0:y1, x0:x1] = masks_c
        boxes = batched_mask_to_box(masks)
        # drop masks whose box touches the crop edge but not the image edge
        # (crop artifacts; utils/amg.py is_box_near_crop_edge)
        edge = is_box_near_crop_edge(boxes, crop_box, [0, 0, ow, oh])
        if edge.any():
            keep = ~edge
            masks, ious, stabs = masks[keep], ious[keep], stabs[keep]
            points, boxes = points[keep], boxes[keep]
        if len(masks) == 0:
            return None
        # in-crop NMS by predicted IoU
        keep = box_nms(boxes, ious, self.box_nms_thresh)
        crop_area = float((x1 - x0) * (y1 - y0))
        return MaskData(
            rles=[None] * len(keep),       # encoded lazily at the end
            boxes=boxes[keep], iou_preds=ious[keep], stability=stabs[keep],
            points=points[keep]), masks[keep], crop_area

    def generate(self, image: np.ndarray) -> List[dict]:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)

        masks_l, ious_l, stabs_l, pts_l, boxes_l, crop_a = [], [], [], [], [], []
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            res = self._process_crop(image, crop_box, layer_idx, orig_size)
            if res is None:
                continue
            data, masks, area = res
            masks_l.append(masks)
            ious_l.append(data.iou_preds)
            stabs_l.append(data.stability)
            pts_l.append(data.points)
            boxes_l.append(data.boxes)
            crop_a.append(np.full((len(masks),), area))
        if not masks_l:
            return []
        masks = np.concatenate(masks_l, 0)
        ious = np.concatenate(ious_l, 0)
        stabs = np.concatenate(stabs_l, 0)
        points = np.concatenate(pts_l, 0)
        boxes = np.concatenate(boxes_l, 0)
        crop_areas = np.concatenate(crop_a, 0)

        # cross-crop dedup preferring masks from SMALLER crops (:202-212)
        if len(crop_boxes) > 1:
            keep = box_nms(boxes, 1.0 / crop_areas, self.crop_nms_thresh)
            masks, ious, stabs = masks[keep], ious[keep], stabs[keep]
            points, boxes = points[keep], boxes[keep]

        # small-region postprocess: fill holes, drop islands, re-NMS
        # preferring untouched masks (:324-372)
        if self.min_mask_region_area > 0 and len(masks):
            changed_scores = np.ones((len(masks),), np.float32)
            for k in range(len(masks)):
                m, ch1 = remove_small_regions(masks[k],
                                              self.min_mask_region_area,
                                              "holes")
                m, ch2 = remove_small_regions(m, self.min_mask_region_area,
                                              "islands")
                masks[k] = m
                if ch1 or ch2:
                    changed_scores[k] = 0.0
            boxes = batched_mask_to_box(masks)
            keep = box_nms(boxes, changed_scores,
                           max(self.box_nms_thresh, self.crop_nms_thresh))
            masks, ious, stabs = masks[keep], ious[keep], stabs[keep]
            points, boxes = points[keep], boxes[keep]

        out = []
        for k in range(len(masks)):
            area = int(masks[k].sum())
            if area == 0:
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
