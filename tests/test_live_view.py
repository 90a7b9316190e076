"""Live viewer smoke: headless (Agg) render path + hotkey state machine."""

import os

import matplotlib
matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, init_state, landmarks
from surikatoko_tpu.viz.live_view import LiveMonoSlamView


class _Key:
    def __init__(self, key):
        self.key = key


def _state(params, K=6):
    st = init_state(K)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.uniform((40, 40), (280, 200), size=(K, 2)))
    rho = jnp.asarray(rng.uniform(0.4, 0.9, size=K))
    st, _ = landmarks.add_landmarks(params, st, pix, jnp.ones(K, bool), rho)
    return st


def test_headless_frame_dump(tmp_path):
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0)
    st = _state(params)
    view = LiveMonoSlamView(save_frames_dir=str(tmp_path))
    for f in range(2):
        view.update(params, st, f, gt_wfc_t=np.zeros(3))
    view.close()
    files = sorted(os.listdir(tmp_path))
    assert files == ["frame00000.png", "frame00001.png"]
    assert os.path.getsize(tmp_path / files[0]) > 5000


def test_hotkey_state_machine(tmp_path):
    view = LiveMonoSlamView(save_frames_dir=str(tmp_path))
    assert not (view.suppress or view.want_reset or view.want_dump
                or view.want_quit)
    view._on_key(_Key("s"))
    assert view.suppress
    view._on_key(_Key("s"))
    assert not view.suppress
    view._on_key(_Key("u"))
    view._on_key(_Key("i"))
    view._on_key(_Key("q"))
    assert view.want_reset and view.want_dump and view.want_quit
    view.close()


class _PickEvent:
    def __init__(self, artist, ind):
        self.artist = artist
        self.ind = ind


def test_scene_picking(tmp_path, capsys):
    """Pick a landmark in the 3D pane: resolves to its SLOT, prints the
    state line, highlights until Escape clears (reference mouse scene
    interaction, demo-davison-mono-slam-ui.h:77)."""
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0)
    st = _state(params)
    view = LiveMonoSlamView(save_frames_dir=str(tmp_path))
    view.update(params, st, 0, gt_wfc_t=np.zeros(3))
    # the scatter's point index maps back to the SLOT id, not the draw order
    assert view._pick_map.shape[0] == 6
    ev = _PickEvent(view._sc_artist, np.asarray([2]))
    view._on_pick(ev)
    assert view.picked_slot == int(view._pick_map[2])
    out = capsys.readouterr().out
    assert f"picked lm[{view.picked_slot}]" in out and "sigma=" in out
    info = view._pick_info[view.picked_slot]
    assert info["sigma"] > 0 and info["gen"] == 1
    # highlight survives a redraw, Escape clears it
    view.update(params, st, 1, gt_wfc_t=np.zeros(3))
    assert view.picked_slot is not None
    view._on_key(_Key("escape"))
    assert view.picked_slot is None
    view.close()
