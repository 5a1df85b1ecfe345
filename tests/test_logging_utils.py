"""Logging meters / sinks (SURVEY §2 ㉒ parity surface)."""

import json
import os

from semi_seg_ecg_tpu.utils.logging import (
    JsonlLogger,
    MetricLogger,
    SmoothedValue,
    log,
    set_logging_enabled,
)


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0        # window keeps [2, 3, 4]
    assert v.avg == 3.0
    assert v.global_avg == 2.5    # all-time mean
    assert v.max == 4.0
    v2 = SmoothedValue()
    v2.update(2.0, n=3)           # weighted update (eval loss meter usage)
    v2.update(4.0, n=1)
    assert v2.global_avg == (2.0 * 3 + 4.0) / 4


def test_metric_logger_meters_and_str():
    m = MetricLogger()
    m.update(loss=1.0, lr=0.1)
    m.update(loss=3.0)
    assert m.meters["loss"].global_avg == 2.0
    assert m.stats() == {"loss": 2.0, "lr": 0.1}
    assert "loss" in str(m)
    m.update(skipme=None)  # None values ignored
    assert "skipme" not in m.meters
    assert m.loss.global_avg == 2.0  # attr access
    try:
        m.nope
        assert False
    except AttributeError:
        pass


def test_log_every_yields_everything(capsys):
    m = MetricLogger()
    seen = list(m.log_every(range(45), print_freq=20, header="T:"))
    assert seen == list(range(45))
    out = capsys.readouterr().out
    assert "T:" in out and "Total time" in out


def test_rank0_gating(capsys):
    set_logging_enabled(False)
    log("hidden")
    log("forced", force=True)
    set_logging_enabled(True)
    out = capsys.readouterr().out
    assert "hidden" not in out
    assert "forced" in out


def test_jsonl_logger(tmp_path):
    j = JsonlLogger(str(tmp_path))
    j.write({"epoch": 0, "train_loss": 1.5})
    j.write({"epoch": 1, "train_loss": 1.0})
    with open(os.path.join(tmp_path, "log.txt")) as f:
        lines = [json.loads(l) for l in f]
    assert lines[1] == {"epoch": 1, "train_loss": 1.0}
    # disabled when no output dir (non-main processes)
    JsonlLogger(None).write({"x": 1})  # no-op, no crash
