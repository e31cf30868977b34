"""Metrics + LR schedule parity vs the reference's numpy/math definitions."""

import math

import numpy as np

from deep_active_semantic_segmentation_tpu.ops import lr_schedule, metrics


class NumpyEvaluator:
    """Verbatim re-derivation of reference utils/metrics.py for the oracle."""

    def __init__(self, num_class):
        self.num_class = num_class
        self.cm = np.zeros((num_class, num_class))

    def add(self, gt, pred):
        mask = (gt >= 0) & (gt < self.num_class)
        label = self.num_class * gt[mask].astype(int) + pred[mask]
        count = np.bincount(label, minlength=self.num_class ** 2)
        self.cm += count.reshape(self.num_class, self.num_class)


def test_confusion_and_metrics_match_numpy_oracle():
    rng = np.random.RandomState(0)
    C = 7
    ours = metrics.Evaluator(C)
    oracle = NumpyEvaluator(C)
    for seed in range(3):
        gt = rng.randint(0, C + 3, size=(2, 33, 17))  # some out-of-range = ignored
        gt[gt >= C] = 255
        pred = rng.randint(0, C, size=(2, 33, 17))
        ours.add_batch(gt, pred)
        oracle.add(gt, pred)
    assert np.allclose(ours.confusion, oracle.cm)

    with np.errstate(divide="ignore", invalid="ignore"):
        miou_oracle = np.nanmean(np.diag(oracle.cm) / (
            oracle.cm.sum(1) + oracle.cm.sum(0) - np.diag(oracle.cm)))
    assert abs(ours.Mean_Intersection_over_Union() - miou_oracle) < 1e-7
    assert abs(ours.Pixel_Accuracy() - np.diag(oracle.cm).sum() / oracle.cm.sum()) < 1e-7


def test_metrics_with_absent_class_uses_nanmean():
    ev = metrics.Evaluator(4)
    gt = np.zeros((1, 8, 8), np.int32)      # only class 0 present
    pred = np.zeros((1, 8, 8), np.int32)
    ev.add_batch(gt, pred)
    assert abs(ev.Mean_Intersection_over_Union() - 1.0) < 1e-7


def _reference_lr(mode, base_lr, num_epochs, iters_per_epoch, T, lr_step=100,
                  warmup_iters=0):
    N = num_epochs * iters_per_epoch
    if mode == "cos":
        lr = 0.5 * base_lr * (1 + math.cos(1.0 * T / N * math.pi))
    elif mode == "poly":
        lr = base_lr * pow((1 - 1.0 * T / N), 0.9)
    elif mode == "step":
        epoch = T // iters_per_epoch
        lr = base_lr * (0.2 ** (epoch // lr_step))
    if warmup_iters > 0 and T < warmup_iters:
        lr = lr * 1.0 * T / warmup_iters
    return lr


def test_lr_schedules_match_reference_formulas():
    for mode in ("poly", "cos", "step"):
        sched = lr_schedule.make_schedule(mode, 0.01, num_epochs=50,
                                          iters_per_epoch=20, lr_step=10)
        for T in (0, 1, 57, 500, 999):
            ref = _reference_lr(mode, 0.01, 50, 20, T, lr_step=10)
            assert abs(float(sched(T)) - ref) < 1e-7, (mode, T)


def test_lr_warmup():
    sched = lr_schedule.make_schedule("poly", 0.01, 10, 10, warmup_epochs=2)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) < float(sched(21))


def test_lr_schedule_dynamic_operand_overrides_constants():
    """The AL loop passes [total_iters, iters_per_epoch] as a traced
    operand so ONE compiled train step serves every round's growing
    labeled set (SURVEY hard part #6): sched(step, dyn) must equal a
    schedule BUILT with those constants, for every mode."""
    import numpy as np

    for mode in ("poly", "cos", "step"):
        base = lr_schedule.make_schedule(mode, 0.01, num_epochs=3,
                                         iters_per_epoch=7, lr_step=10,
                                         warmup_epochs=1)
        for epochs, ipe in ((3, 7), (50, 20), (12, 160)):
            want = lr_schedule.make_schedule(mode, 0.01, num_epochs=epochs,
                                             iters_per_epoch=ipe, lr_step=10,
                                             warmup_epochs=1)
            dyn = np.array([epochs * ipe, ipe], np.float32)
            for T in (0, 1, 57, 500, 999):
                assert abs(float(base(T, dyn)) - float(want(T))) < 1e-7, (
                    mode, epochs, ipe, T)
