import numpy as np
import pytest

from srba_slam_tpu.native.loader import NativeImageDirSource
from srba_slam_tpu.utils.framesource import ImageDirSource

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    for i in range(5):
        for side in ("l", "r"):
            img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
            # embed the frame index so ordering is checkable
            img[0, 0] = i
            PIL.fromarray(img).save(d / f"{side}_{i:06d}.png")
    return str(d)


def test_native_loader_matches_python(image_dir):
    if not NativeImageDirSource.available():
        pytest.skip("native loader toolchain unavailable")
    native = list(NativeImageDirSource(image_dir, "l_%06d.png", "r_%06d.png"))
    python = list(ImageDirSource(image_dir, "l_%06d.png", "r_%06d.png"))
    assert len(native) == len(python) == 5
    for (nl, nr), (pl, pr) in zip(native, python):
        np.testing.assert_array_equal(nl, pl)
        np.testing.assert_array_equal(nr, pr)


def test_native_loader_ordering_and_range(image_dir):
    if not NativeImageDirSource.available():
        pytest.skip("native loader toolchain unavailable")
    frames = list(NativeImageDirSource(image_dir, "l_%06d.png", "r_%06d.png",
                                       start_index=1, end_index=3))
    assert len(frames) == 3
    assert [int(f[0][0, 0]) for f in frames] == [1, 2, 3]


def test_native_loader_missing_dir():
    if not NativeImageDirSource.available():
        pytest.skip("native loader toolchain unavailable")
    assert list(NativeImageDirSource("/nonexistent", "l_%06d.png", "r_%06d.png")) == []
