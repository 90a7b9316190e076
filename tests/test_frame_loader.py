"""Native frame loader: build, decode parity with the python reader, order,
prefetch behavior, fallback."""

import numpy as np
import pytest

from surikatoko_tpu.io.frame_loader import FrameLoader
from surikatoko_tpu.vision.picture import load_picture


def write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(img, np.uint8).tobytes())


def write_ppm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n# comment\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(img, np.uint8).tobytes())


@pytest.fixture
def image_dir(tmp_path, rng):
    for i in range(6):
        img = rng.integers(0, 255, size=(24, 32), dtype=np.uint8)
        write_pgm(tmp_path / f"{i:06d}.pgm", img)
    return tmp_path


def test_loader_reads_all_frames_in_order(image_dir):
    with FrameLoader(str(image_dir)) as fl:
        frames = list(fl)
    assert [i for i, _ in frames] == list(range(6))
    assert frames[0][1].shape == (24, 32)
    # parity with the python decoder
    ref = load_picture(str(image_dir / "000003.pgm")).gray
    np.testing.assert_array_equal(frames[3][1], ref)


def test_loader_ppm_gray_conversion(tmp_path, rng):
    img = rng.integers(0, 255, size=(10, 12, 3), dtype=np.uint8)
    write_ppm(tmp_path / "a.ppm", img)
    with FrameLoader(str(tmp_path)) as fl:
        (_, gray), = list(fl)
    i32 = img.astype(np.uint32)
    want = ((299 * i32[..., 0] + 587 * i32[..., 1] + 114 * i32[..., 2])
            // 1000).astype(np.uint8)
    np.testing.assert_array_equal(gray, want)


def test_loader_native_was_used(image_dir):
    fl = FrameLoader(str(image_dir))
    try:
        assert fl.native, "native library should build in this image"
        assert fl.frame_count == 6
    finally:
        fl.close()


def test_loader_empty_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        FrameLoader(str(tmp_path / "missing_or_empty"))
