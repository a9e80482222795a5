"""Hand-computed mini cases for the in-repo nuScenes detection metric
(vampire_tpu/evaluation/nusc_metric.py), the devkit-free NDS/mAP path the
reference delegates to nuscenes-devkit (det_evaluators.py:61-117)."""
import numpy as np
import pytest

from vampire_tpu.evaluation import nusc_metric as M


def _box(name='car', xy=(0.0, 0.0), z=0.5, size=(1.9, 4.5, 1.6), yaw=0.0,
         vel=(0.0, 0.0), score=None, attr='vehicle.parked', num_pts=10,
         ego=(0.0, 0.0, 0.0)):
    b = dict(translation=[xy[0], xy[1], z], size=list(size),
             rotation=[np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)],
             velocity=list(vel), detection_name=name,
             attribute_name=attr, ego_translation=list(ego))
    if score is None:
        b['num_pts'] = num_pts
    else:
        b['detection_score'] = float(score)
    return b


def test_quaternion_yaw_roundtrip():
    for yaw in (-2.5, -0.3, 0.0, 1.1, 3.0):
        q = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
        assert M.quaternion_yaw(q) == pytest.approx(yaw, abs=1e-9)


def test_scale_iou():
    a = dict(size=[2.0, 2.0, 2.0])
    b = dict(size=[1.0, 1.0, 1.0])
    # inter 1, union 8 + 1 - 1 = 8
    assert M.scale_iou(a, b) == pytest.approx(1.0 / 8.0)
    assert M.scale_iou(a, a) == pytest.approx(1.0)


def test_yaw_diff_periods():
    g = _box(yaw=0.0)
    p = _box(yaw=np.pi, score=1.0)
    # full period: pi apart
    assert M.yaw_diff(g, p, 2 * np.pi) == pytest.approx(np.pi)
    # barrier period pi: 0 apart
    assert M.yaw_diff(g, p, np.pi) == pytest.approx(0.0, abs=1e-9)


def test_cummean_nan_skipping():
    x = np.array([np.nan, 1.0, np.nan, 3.0])
    got = M.cummean(x)
    np.testing.assert_allclose(got, [0.0, 1.0, 1.0, 2.0])
    assert np.all(M.cummean(np.array([np.nan, np.nan])) == 1.0)


def test_perfect_predictions_nds_one():
    gt = {'s0': [_box(xy=(1.0, 2.0)), _box(xy=(10.0, -3.0), yaw=0.7)]}
    pred = {'s0': [_box(xy=(1.0, 2.0), score=0.9),
                   _box(xy=(10.0, -3.0), yaw=0.7, score=0.8)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    assert m['mean_ap'] == pytest.approx(1.0)
    for v in m['tp_errors'].values():
        assert v == pytest.approx(0.0, abs=1e-12)
    assert m['nd_score'] == pytest.approx(1.0)


def test_no_predictions_nds_zero():
    gt = {'s0': [_box()]}
    m = M.evaluate_detection(gt, {'s0': []}, ['car'])
    assert m['mean_ap'] == 0.0
    # no matches -> every TP error is 1.0 -> every TP score 0
    assert m['nd_score'] == 0.0
    for v in m['tp_errors'].values():
        assert v == 1.0


def test_half_matched_ap_hand_computed():
    # 2 GT, 1 exact pred: recall caps at 0.5 -> interpolated precision is 1
    # on recall points 0..50, 0 after; AP = 40 * 0.9 / (90 * 0.9) = 4/9
    gt = {'s0': [_box(xy=(0.0, 0.0)), _box(xy=(20.0, 0.0))]}
    pred = {'s0': [_box(xy=(0.0, 0.0), score=1.0)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    for ap in m['label_aps']['car'].values():
        assert ap == pytest.approx(4.0 / 9.0)
    # the matched pred is exact -> all TP errors 0 over the achieved recall
    for v in m['tp_errors'].values():
        assert v == pytest.approx(0.0, abs=1e-12)
    assert m['nd_score'] == pytest.approx((5 * 4.0 / 9.0 + 5) / 10)


def test_distance_thresholds_differentiate():
    gt = {'s0': [_box(xy=(0.0, 0.0))]}
    pred = {'s0': [_box(xy=(1.5, 0.0), score=1.0)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    aps = m['label_aps']['car']
    assert aps['0.5'] == 0.0 and aps['1.0'] == 0.0
    assert aps['2.0'] == pytest.approx(1.0)
    assert aps['4.0'] == pytest.approx(1.0)
    # ATE at the TP threshold (2 m) is the 1.5 m offset
    assert m['label_tp_errors']['car']['trans_err'] == pytest.approx(1.5)


def test_velocity_and_attribute_errors():
    gt = {'s0': [_box(vel=(1.0, 0.0), attr='vehicle.moving')]}
    pred = {'s0': [_box(vel=(1.0, 2.0), attr='vehicle.parked', score=1.0)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    assert m['tp_errors']['vel_err'] == pytest.approx(2.0)
    assert m['tp_errors']['attr_err'] == pytest.approx(1.0)
    assert m['tp_errors']['trans_err'] == pytest.approx(0.0, abs=1e-12)


def test_class_range_filter():
    # car GT at 60 m ego distance is outside the 50 m class range: with the
    # far GT filtered, the near pred scores a clean AP 1
    gt = {'s0': [_box(xy=(0.0, 0.0)),
                 _box(xy=(60.0, 0.0), ego=(60.0, 0.0, 0.0))]}
    pred = {'s0': [_box(xy=(0.0, 0.0), score=1.0)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    assert m['mean_ap'] == pytest.approx(1.0)
    # far PREDICTIONS are filtered too
    pred2 = {'s0': [_box(xy=(0.0, 0.0), score=1.0),
                    _box(xy=(55.0, 0.0), ego=(55.0, 0.0, 0.0), score=0.9)]}
    m2 = M.evaluate_detection(gt, pred2, ['car'])
    assert m2['mean_ap'] == pytest.approx(1.0)


def test_zero_point_gt_filtered():
    gt = {'s0': [_box(), _box(xy=(20.0, 0.0), num_pts=0)]}
    pred = {'s0': [_box(score=1.0)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    assert m['mean_ap'] == pytest.approx(1.0)


def test_excluded_tp_metrics_are_nan():
    gt = {'s0': [_box(name='traffic_cone', size=(0.4, 0.4, 0.8), attr=''),
                 _box(name='barrier', xy=(5.0, 0.0), size=(2.5, 0.5, 1.0),
                      attr='')]}
    pred = {'s0': [_box(name='traffic_cone', size=(0.4, 0.4, 0.8), attr='',
                        score=1.0),
                   _box(name='barrier', xy=(5.0, 0.0),
                        size=(2.5, 0.5, 1.0), attr='', score=0.9)]}
    m = M.evaluate_detection(gt, pred, ['traffic_cone', 'barrier'])
    tc = m['label_tp_errors']['traffic_cone']
    assert np.isnan(tc['orient_err']) and np.isnan(tc['vel_err'])
    assert np.isnan(tc['attr_err'])
    ba = m['label_tp_errors']['barrier']
    assert np.isnan(ba['vel_err']) and np.isnan(ba['attr_err'])
    assert not np.isnan(ba['orient_err'])
    # aggregate orient comes from barrier alone; vel/attr undefined -> the
    # scores contribute 0 and NDS stays finite
    assert np.isfinite(m['nd_score'])


def test_empty_attribute_gt_is_nan_skipped():
    # one GT with an attribute, one without: AAE averages only the defined one
    gt = {'s0': [_box(attr='vehicle.parked'),
                 _box(xy=(10.0, 0.0), attr='')]}
    pred = {'s0': [_box(attr='vehicle.moving', score=1.0),
                   _box(xy=(10.0, 0.0), attr='vehicle.parked', score=0.9)]}
    m = M.evaluate_detection(gt, pred, ['car'])
    assert m['tp_errors']['attr_err'] == pytest.approx(1.0)


def test_max_boxes_guard():
    gt = {'s0': [_box()]}
    pred = {'s0': [_box(score=0.5)] * 501}
    with pytest.raises(ValueError):
        M.evaluate_detection(gt, pred, ['car'])
