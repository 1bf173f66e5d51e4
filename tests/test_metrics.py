import numpy as np

from pmv_tpu.utils import metrics
from pmv_tpu.utils.meters import TestMeter


def test_topks_correct():
    preds = np.array(
        [
            [0.1, 0.9, 0.0, 0.0],  # top1 = 1
            [0.5, 0.1, 0.3, 0.1],  # top1 = 0
            [0.0, 0.1, 0.2, 0.7],  # top1 = 3
        ]
    )
    labels = np.array([1, 2, 3])
    top1, top2 = metrics.topks_correct(preds, labels, [1, 2])
    assert int(top1) == 2  # rows 0, 2
    assert int(top2) == 3  # row 1's label 2 is 2nd highest


def test_test_meter_sum_ensemble():
    # 2 videos x 3 clips each, 4 classes.
    meter = TestMeter(
        num_videos=2, num_clips=3, num_cls=4, overall_iters=1,
        ensemble_method="sum",
    )
    preds = np.array(
        [
            [1.0, 0, 0, 0], [1.0, 0, 0, 0], [0, 0, 0, 1.0],  # video 0
            [0, 1.0, 0, 0], [0, 1.0, 0, 0], [0, 1.0, 0, 0],  # video 1
        ]
    )
    labels = np.array([0, 0, 0, 1, 1, 1])
    clip_ids = np.arange(6)
    meter.update_stats(preds, labels, clip_ids)
    stats = meter.finalize_metrics(ks=(1, 2))
    assert stats["top1_acc"] == "100.00"
    np.testing.assert_allclose(meter.video_preds[0], [2.0, 0, 0, 1.0])


def test_test_meter_max_ensemble():
    meter = TestMeter(
        num_videos=1, num_clips=2, num_cls=3, overall_iters=1,
        ensemble_method="max",
    )
    preds = np.array([[0.2, 0.5, 0.3], [0.6, 0.1, 0.3]])
    labels = np.array([0, 0])
    meter.update_stats(preds, labels, np.array([0, 1]))
    np.testing.assert_allclose(meter.video_preds[0], [0.6, 0.5, 0.3])


def test_val_meter_multilabel_map():
    """ValMeter reports mAP instead of top-k for multi-label epochs."""
    import numpy as np

    from pmv_tpu.config import get_cfg
    from pmv_tpu.utils.meters import ValMeter

    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    meter = ValMeter(max_iter=2, cfg=cfg)
    preds = np.array([[0.9, 0.1, 0.8, 0.0], [0.1, 0.9, 0.0, 0.7]])
    labels = np.array([[1, 0, 1, 0], [0, 1, 0, 1]], np.float32)
    meter.update_stats(0.0, 0.0, 2)
    meter.update_predictions(preds, labels)
    stats = meter.log_epoch_stats(0)
    assert "map" in stats
    assert stats["map"] == 1.0  # perfectly ranked
    assert "top1_err" not in stats
