"""Utils-layer tests: EventStorage/writers (metrics.json schema), logger
helpers, comm single-process semantics, serialization, env report, pbar."""

import io
import json
import logging
import os

import numpy as np
import pytest

from lvt_tpu.utils import comm
from lvt_tpu.utils.collect_env import collect_env_info
from lvt_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
    get_event_storage,
)
from lvt_tpu.utils.logger import log_every_n, log_first_n
from lvt_tpu.utils.pbar import ProgressBar
from lvt_tpu.utils.serialize import PicklableWrapper


def test_event_storage_smoothing_and_step():
    with EventStorage(start_iter=5) as s:
        assert get_event_storage() is s
        for i in range(10):
            if i:
                s.step()  # latest scalars reset on step (reference events.py)
            s.put_scalar("loss", float(i), smoothing_hint=True)
            s.put_scalar("lr", float(i), smoothing_hint=False)
        assert s.iter == 14
        latest = s.latest_with_smoothing_hint(window_size=4)
        assert latest["lr"] == 9.0  # unsmoothed
        assert latest["loss"] == np.median([6, 7, 8, 9])


def test_json_writer_schema(tmp_path):
    path = str(tmp_path / "metrics.json")
    with EventStorage(0) as s:
        w = JSONWriter(path)
        s.put_scalar("loss_total", 1.5)
        w.write()
        s.step()
        s.put_scalar("loss_total", 0.5)
        w.write()
        w.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"iteration": 0, "loss_total": 1.5}
    assert lines[1]["iteration"] == 1


def test_common_metric_printer_runs(caplog):
    with EventStorage(0) as s:
        s.put_scalar("loss_x", 2.0)
        s.put_scalar("time", 0.1)
        s.put_scalar("lr", 1e-3, smoothing_hint=False)
        p = CommonMetricPrinter(max_iter=100)
        with caplog.at_level(logging.INFO, logger="lvt_tpu.utils.events"):
            p.write()
    assert any("loss_x" in r.message for r in caplog.records)


def test_log_first_n_and_every_n(caplog):
    logger_name = __name__
    with caplog.at_level(logging.INFO):
        for _ in range(5):
            log_first_n(logging.INFO, "hello-first", n=2, name=logger_name)
    assert sum("hello-first" in r.message for r in caplog.records) == 2

    caplog.clear()
    with caplog.at_level(logging.INFO):
        for _ in range(6):
            log_every_n(logging.INFO, "hello-every", n=3, name=logger_name)
    assert sum("hello-every" in r.message for r in caplog.records) == 2


def test_comm_single_process_paths():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather(5) == [5]
    d = {"x": 3.0}
    assert comm.reduce_dict(d) == d
    assert isinstance(comm.shared_random_seed(), int)


def test_picklable_wrapper_roundtrip():
    import pickle

    w = PicklableWrapper(sorted)
    w2 = pickle.loads(pickle.dumps(w))
    assert w2([3, 1, 2]) == [1, 2, 3]


def test_collect_env_info_mentions_jax():
    info = collect_env_info()
    assert "jax" in info and "Python" in info


def test_progress_bar():
    buf = io.StringIO()
    with ProgressBar(10, stream=buf) as pb:
        for _ in range(10):
            pb.update()
    out = buf.getvalue()
    assert "10/10" in out and "100%" in out


def test_periodic_writer_flushes_final_window(tmp_path):
    """Scalars stored AFTER the last period boundary (e.g. EvalHook's
    final-eval metrics in after_train) must still land in metrics.json:
    PeriodicWriter.after_train has to write() before close()."""
    from lvt_tpu.engine.hooks import PeriodicWriter

    path = str(tmp_path / "metrics.json")
    with EventStorage(0) as s:

        class T:  # minimal trainer stub the hook reads
            iter = 0
            max_iter = 100

        hook = PeriodicWriter([JSONWriter(path)], period=20)
        hook.trainer = T()
        hook.after_step()  # iter 0: not a boundary, nothing written
        # a final-eval scalar after the last boundary
        s.put_scalar("eval/FVD", 42.0, smoothing_hint=False)
        hook.after_train()
    lines = [json.loads(l) for l in open(path)]
    assert any("eval/FVD" in ln for ln in lines), lines


def test_event_storage_name_scope_prefixes_scalars():
    with EventStorage(0) as s:
        with s.name_scope("eval"):
            s.put_scalar("loss", 1.0)
        s.put_scalar("loss", 2.0)
        hist = s.histories()
        assert "eval/loss" in hist and "loss" in hist
        # exception safety: the prefix must not leak
        try:
            with s.name_scope("bad"):
                raise RuntimeError
        except RuntimeError:
            pass
        s.put_scalar("after", 3.0)
        assert "after" in s.histories()
