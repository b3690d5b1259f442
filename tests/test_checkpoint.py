"""Checkpoint/resume: sample-slab accumulation must reproduce a one-shot
render (counter RNG ⇒ slab k's streams are the one-shot's samples
[k*slab, (k+1)*slab)), and resuming from a partial checkpoint must
continue, not restart."""
import dataclasses
import os

import numpy as np
import pytest

from vimg_tpu.render.checkpoint import (load_checkpoint,
                                        render_with_checkpoints,
                                        save_checkpoint)
from vimg_tpu.scene.json_loader import load_json_scene

SCENES = "/root/reference/scenes"


def _scene():
    p = os.path.join(SCENES, "cornell_box_spheres.json")
    if not os.path.exists(p):
        pytest.skip("reference scenes unavailable")
    scene, st = load_json_scene(p)
    return scene, dataclasses.replace(st, width=48, height=32, spp=6,
                                      max_depth=5, batch_size=1 << 13)


def test_slabs_equal_oneshot(tmp_path):
    scene, st = _scene()
    from vimg_tpu.render.wavefront import render_wavefront
    ref = np.asarray(render_wavefront(scene, st))
    out = render_with_checkpoints(scene, st, str(tmp_path / "a.ckpt"),
                                  slab_spp=2)
    # f32 accumulation grouping differs (per-slab sums added on host)
    assert np.abs(np.asarray(out) - ref).max() < 1e-5


def test_resume_continues(tmp_path):
    scene, st = _scene()
    path = str(tmp_path / "b.ckpt")
    # run slabs 0..1 (4 of 6 spp), simulate an interruption, then resume
    part = dataclasses.replace(st, spp=4)
    partial = render_with_checkpoints(scene, part, path, slab_spp=2)
    ck = load_checkpoint(path)
    assert ck["spp_done"] == 4
    out = render_with_checkpoints(scene, st, path, slab_spp=2)
    full = render_with_checkpoints(scene, st, str(tmp_path / "c.ckpt"),
                                   slab_spp=2)
    assert np.abs(np.asarray(out) - np.asarray(full)).max() < 1e-6
    assert np.abs(np.asarray(partial) - np.asarray(full)).mean() > 1e-5


def test_checkpoint_atomic_no_leak(tmp_path):
    d = tmp_path / "sub"
    d.mkdir()
    p = str(d / "x.ckpt")
    save_checkpoint(p, np.zeros((4, 4, 3), np.float32), 3)
    save_checkpoint(p, np.ones((4, 4, 3), np.float32), 6)
    ck = load_checkpoint(p)
    assert ck["spp_done"] == 6 and ck["accum"].mean() == 1.0
    # no stray tmp files left behind
    assert os.listdir(d) == [os.path.basename(p)]
