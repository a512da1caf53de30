import numpy as np

from hawkeye_tpu.utils import AverageMeter, PerformanceMeter, accuracy


def test_average_meter():
    m = AverageMeter("loss")
    m.update(2.0, n=2)
    m.update(4.0, n=2)
    assert m.avg == 3.0
    m.reset()
    assert m.count == 0


def test_performance_meter():
    pm = PerformanceMeter()
    for v in [10.0, 30.0, 20.0]:
        pm.update(v)
    assert pm.best_value == 30.0
    assert pm.best_epoch == 1
    pm_low = PerformanceMeter(higher_is_better=False)
    for v in [3.0, 1.0, 2.0]:
        pm_low.update(v)
    assert pm_low.best_value == 1.0


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    targets = np.array([1, 2])
    assert accuracy(logits, targets, topk=1) == 50.0
    assert accuracy(logits, targets, topk=3) == 100.0
    one_hot = np.eye(3)[targets]
    assert accuracy(logits, one_hot, topk=1) == 50.0
