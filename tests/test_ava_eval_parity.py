"""AVA evaluator parity vs the reference's vendored PASCAL evaluator
(`MViT/slowfast/utils/ava_evaluation/object_detection_evaluation.py`) on
random synthetic scenes, plus protocol helpers (exclusions, labelmap,
mini-groundtruth, vectorized detection conversion)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from pmv_tpu.utils import ava_eval  # noqa: E402


def _random_scenes(seed, n_images=6, n_classes=4):
    rng = np.random.default_rng(seed)
    gt_b, gt_l, gt_s = {}, {}, {}
    det_b, det_l, det_s = {}, {}, {}
    for i in range(n_images):
        key = f"vid{i % 2},{900 + i:04d}"
        g = rng.integers(1, 4)
        boxes = rng.uniform(0, 0.5, (g, 4))
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(0.1, 0.5, (g, 2))
        gt_b[key] = boxes.tolist()
        gt_l[key] = rng.integers(1, n_classes + 1, g).tolist()
        gt_s[key] = [1.0] * g
        d = rng.integers(2, 8)
        # Mix of jittered-true and random boxes.
        src = boxes[rng.integers(0, g, d)]
        jitter = rng.normal(0, 0.05, (d, 4))
        dboxes = np.clip(src + jitter, 0, 1)
        det_b[key] = dboxes.tolist()
        det_l[key] = rng.integers(1, n_classes + 1, d).tolist()
        det_s[key] = rng.uniform(0, 1, d).tolist()
    return (gt_b, gt_l, gt_s), (det_b, det_l, det_s)


def _reference_evaluate(categories, groundtruth, detections, excluded):
    from ref_loader import import_reference_models

    # The vendored evaluator predates numpy 2 (`metrics.py` uses np.float).
    for alias, real in (("float", float), ("bool", bool), ("int", int)):
        if not hasattr(np, alias):
            setattr(np, alias, real)

    import_reference_models("MViT")  # puts slowfast + stubs on sys.path
    from slowfast.utils.ava_evaluation import (
        object_detection_evaluation,
        standard_fields,
    )

    ev = object_detection_evaluation.PascalDetectionEvaluator(categories)
    boxes, labels, _ = groundtruth
    for key in boxes:
        if key in excluded:
            continue
        ev.add_single_ground_truth_image_info(
            key,
            {
                standard_fields.InputDataFields.groundtruth_boxes: np.array(
                    boxes[key], dtype=float
                ),
                standard_fields.InputDataFields.groundtruth_classes: np.array(
                    labels[key], dtype=int
                ),
                standard_fields.InputDataFields.groundtruth_difficult: (
                    np.zeros(len(boxes[key]), dtype=bool)
                ),
            },
        )
    boxes, labels, scores = detections
    for key in boxes:
        if key in excluded:
            continue
        ev.add_single_detected_image_info(
            key,
            {
                standard_fields.DetectionResultFields.detection_boxes: (
                    np.array(boxes[key], dtype=float)
                ),
                standard_fields.DetectionResultFields.detection_classes: (
                    np.array(labels[key], dtype=int)
                ),
                standard_fields.DetectionResultFields.detection_scores: (
                    np.array(scores[key], dtype=float)
                ),
            },
        )
    return ev.evaluate()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_map_matches_reference_evaluator(seed):
    n_classes = 4
    categories = [
        {"id": c, "name": f"act{c}"} for c in range(1, n_classes + 1)
    ]
    gt, det = _random_scenes(seed, n_classes=n_classes)
    excluded = {f"vid0,{900:04d}"} if seed == 1 else set()
    ours = ava_eval.run_evaluation(categories, gt, det, excluded)
    ref = _reference_evaluate(
        categories, gt, det, excluded
    )
    assert ours["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(
        ref["PascalBoxes_Precision/mAP@0.5IOU"], abs=1e-9
    ), (seed, ours, ref)
    for k, v in ref.items():
        if "PerformanceByCategory" in k and not np.isnan(v):
            assert ours[k] == pytest.approx(v, abs=1e-9), k


def test_exclusions_and_mini_groundtruth(tmp_path):
    p = tmp_path / "excl.csv"
    p.write_text("vidA,0904\nvidB,0905\n")
    excl = ava_eval.read_exclusions(str(p))
    assert excl == {"vidA,0904", "vidB,0905"}
    full = (
        {"v,0904": [[0, 0, 1, 1]], "v,0905": [[0, 0, 1, 1]]},
        {"v,0904": [1], "v,0905": [2]},
        {"v,0904": [1.0], "v,0905": [1.0]},
    )
    mini = ava_eval.get_ava_mini_groundtruth(full)
    assert list(mini[0]) == ["v,0904"]


def test_read_labelmap(tmp_path):
    p = tmp_path / "map.pbtxt"
    p.write_text(
        'item {\n  name: "stand"\n  id: 1\n}\n'
        'item {\n  name: "sit"\n  label_id: 3\n}\n'
    )
    cats, ids = ava_eval.read_labelmap(str(p))
    assert ids == {1, 3}
    assert cats == [
        {"id": 1, "name": "stand"}, {"id": 3, "name": "sit"}
    ]


def test_get_ava_eval_data_vectorized_matches_loop():
    rng = np.random.default_rng(0)
    n, c = 7, 5
    scores = rng.uniform(0, 1, (n, c))
    boxes = rng.uniform(0, 1, (n, 4))
    metadata = np.stack(
        [rng.integers(0, 2, n), rng.integers(900, 903, n)], axis=1
    )
    whitelist = {1, 3, 5}
    names = ["vidA", "vidB"]
    ob, ol, osc = ava_eval.get_ava_eval_data(
        scores, boxes, metadata, whitelist, video_idx_to_name=names
    )
    # Reference loop semantics (`ava_eval_helper.py:250-287`).
    exp_boxes, exp_labels, exp_scores = {}, {}, {}
    for i in range(n):
        key = "%s,%04d" % (names[int(metadata[i][0])], int(metadata[i][1]))
        yxyx = [boxes[i][1], boxes[i][0], boxes[i][3], boxes[i][2]]
        for cls_idx in range(c):
            if cls_idx + 1 in whitelist:
                exp_boxes.setdefault(key, []).append(yxyx)
                exp_labels.setdefault(key, []).append(cls_idx + 1)
                exp_scores.setdefault(key, []).append(scores[i][cls_idx])
    assert set(ob) == set(exp_boxes)
    for key in ob:
        np.testing.assert_allclose(ob[key], exp_boxes[key])
        np.testing.assert_array_equal(ol[key], exp_labels[key])
        np.testing.assert_allclose(osc[key], exp_scores[key])
