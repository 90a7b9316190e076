"""Config reader (port of reference test-config-reader.cpp), mat IO, tracker
internals log round-trip."""

import json

import numpy as np
import pytest

from surikatoko_tpu.io.config_reader import ConfigReader
from surikatoko_tpu.io.mat_io import read_matrix_from_file, write_matrix_to_file
from surikatoko_tpu.io.tracker_log import (
    FrameSlice, TrackerInternalsLogger, read_tracker_internals)


def test_config_typed_access(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "// a comment": 0,
        "f_from_int": 2,
        "b_from_int": 1,
        "i_plain": 7,
        "s": "hello",
        "seq": [1, 2, 3.5],
    }))
    cfg = ConfigReader(p)
    assert cfg.get_value("f_from_int", float) == 2.0
    assert cfg.get_value("b_from_int", bool) is True
    assert cfg.get_value("i_plain", int) == 7
    assert cfg.get_value("s", str) == "hello"
    assert cfg.get_seq("seq", float) == [1.0, 2.0, 3.5]
    assert cfg.get_value("missing", float, 9.5) == 9.5
    assert not cfg.has_key("// a comment")  # comment keys dropped


def test_config_bad_coercions(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"x": 2.5, "b": 3}))
    cfg = ConfigReader(p)
    with pytest.raises(TypeError):
        cfg.get_value("x", int)
    with pytest.raises(TypeError):
        cfg.get_value("b", bool)


def test_config_unused_params(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"used": 1, "unused_one": 2, "unused_two": 3}))
    cfg = ConfigReader(p)
    cfg.get_value("used", int)
    assert sorted(cfg.unused_params()) == ["unused_one", "unused_two"]


def test_config_dev_override(tmp_path):
    (tmp_path / "c.json").write_text(json.dumps({"a": 1, "b": 2}))
    (tmp_path / "c-DEV.json").write_text(json.dumps({"b": 99}))
    cfg = ConfigReader(tmp_path / "c.json")
    assert cfg.get_value("a", int) == 1
    assert cfg.get_value("b", int) == 99  # dev override wins


def test_mat_io_roundtrip(tmp_path, rng):
    m = rng.normal(size=(5, 4))
    path = tmp_path / "m.txt"
    write_matrix_to_file(path, m)
    back = read_matrix_from_file(path)
    np.testing.assert_allclose(back, m, atol=0)


def test_mat_io_ragged_raises(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        read_matrix_from_file(p)


def test_tracker_log_roundtrip(tmp_path):
    log = TrackerInternalsLogger()
    for f in range(3):
        s = log.start_new_frame()
        s.cur_reproj_err_meas = 0.5 * f
        s.estimated_sal_pnts = 10 + f
        s.cam_state = np.arange(13.0)
        s.cam_state_gt = np.arange(13.0) + 0.1
        s.estim_err = s.cam_state - s.cam_state_gt
        s.estim_err_std = np.full(13, 0.2)
        log.finish_frame()
    path = tmp_path / "internals.json"
    log.write_json(path)
    doc = read_tracker_internals(path)
    assert doc["FramesCount"] == 3
    assert doc["AvgFrameProcessingDur"] >= 0
    fr = doc["Frames"][2]
    assert fr["EstimatedSalPnts"] == 12
    np.testing.assert_allclose(fr["CamState"], np.arange(13.0))
    np.testing.assert_allclose(fr["EstimErr"], -0.1 * np.ones(13), atol=1e-12)

    # the analysis summarizer consumes the schema
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "analysis"))
    from check_tracker_logs import summarize
    s = summarize(doc)
    assert s["frames_count"] == 3
    assert "within_3sigma_frac" in s
