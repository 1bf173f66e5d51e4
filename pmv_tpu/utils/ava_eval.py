"""AVA-style action detection evaluation: per-class PASCAL AP at IoU 0.5.

Compact numpy re-implementation of the reference's vendored object-detection
evaluator (`MViT/slowfast/utils/ava_evaluation/`, `ava_eval_helper.py`):
detections are matched greedily (by score) to ground-truth boxes of the same
class with IoU >= threshold; AP uses the "all-points" interpolation.
"""

import numpy as np


def box_iou(a, b):
    """a: [N, 4], b: [M, 4] (x1, y1, x2, y2) -> [N, M] IoU."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision(recalls, precisions):
    """All-points interpolated AP (PASCAL)."""
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_detections(groundtruth, detections, num_classes, iou_thresh=0.5):
    """Frame-level detection mAP.

    groundtruth: dict image_key -> (boxes [G, 4], labels [G]).
    detections: dict image_key -> (boxes [D, 4], labels [D], scores [D]).
    Returns (mAP, per_class_AP dict).
    """
    aps = {}
    for c in range(num_classes):
        # Collect per-image GT and detections of class c.
        npos = 0
        records = []  # (score, is_tp)
        gt_by_img = {}
        for key, (g_boxes, g_labels) in groundtruth.items():
            sel = np.asarray(g_labels) == c
            gt_by_img[key] = np.asarray(g_boxes)[sel]
            npos += int(sel.sum())
        if npos == 0:
            continue
        for key, (d_boxes, d_labels, d_scores) in detections.items():
            sel = np.asarray(d_labels) == c
            boxes = np.asarray(d_boxes)[sel]
            scores = np.asarray(d_scores)[sel]
            gts = gt_by_img.get(key, np.zeros((0, 4)))
            matched = np.zeros(len(gts), bool)
            order = np.argsort(-scores)
            for i in order:
                if len(gts) == 0:
                    records.append((scores[i], False))
                    continue
                ious = box_iou(boxes[i : i + 1], gts)[0]
                j = int(np.argmax(ious))
                if ious[j] >= iou_thresh and not matched[j]:
                    matched[j] = True
                    records.append((scores[i], True))
                else:
                    records.append((scores[i], False))
        if not records:
            aps[c] = 0.0
            continue
        records.sort(key=lambda r: -r[0])
        tps = np.array([r[1] for r in records], dtype=np.float64)
        tp_cum = np.cumsum(tps)
        fp_cum = np.cumsum(1.0 - tps)
        recalls = tp_cum / npos
        precisions = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        aps[c] = average_precision(recalls, precisions)
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    return mean_ap, aps
