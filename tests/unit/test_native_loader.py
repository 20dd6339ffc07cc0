"""Native JPEG loader: build, decode correctness vs PIL, batch threading."""

import numpy as np
import pytest

from sgg import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    r = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (224, 224), (1024, 768), (99, 173)]):
        # smooth image → JPEG artifacts small → tight comparison possible
        base = np.zeros((h, w, 3), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        for c in range(3):
            base[..., c] = 127 + 100 * np.sin(xx / (20 + 10 * c)) * np.cos(yy / (25 + 5 * c))
        img = base.clip(0, 255).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


needs_native = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_decode_file_matches_pil(jpegs):
    from PIL import Image

    for p in jpegs:
        got = native.decode_file(p, 224)
        assert got.shape == (224, 224, 3) and got.dtype == np.uint8
        with Image.open(p) as im:
            want = np.asarray(
                im.convert("RGB").resize((224, 224), Image.BILINEAR), np.uint8
            )
        # different DCT-prescale + bilinear path ⇒ allow small deviation
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.mean() < 6.0, (p, diff.mean())


@needs_native
def test_decode_batch_threaded(jpegs):
    out = native.decode_batch(jpegs * 4, 128, n_threads=4)
    assert out.shape == (16, 128, 128, 3)
    single = native.decode_file(jpegs[0], 128)
    np.testing.assert_array_equal(out[0], single)
    np.testing.assert_array_equal(out[4], single)  # same file, same result


@needs_native
def test_decode_missing_file_errors(jpegs, tmp_path):
    with pytest.raises(IOError):
        native.decode_file(str(tmp_path / "nope.jpg"), 64)
    with pytest.raises(IOError, match="failed for 1 files"):
        native.decode_batch([jpegs[0], str(tmp_path / "nope.jpg")], 64)


@needs_native
def test_corrupt_jpeg_errors(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0garbagegarbage")
    with pytest.raises(IOError):
        native.decode_file(str(p), 64)
