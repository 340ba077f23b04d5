"""Native C++ loader: build, decode parity vs cv2, threaded batching."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from image_matching_tpu.data.native_loader import (
    NativeImageLoader,
    decode_image,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.uniform(0, 255, (64, 80)).astype(np.uint8)
        p = d / f"im{i}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    # one jpeg too
    jp = d / "im_j.jpg"
    cv2.imwrite(str(jp), rng.uniform(0, 255, (64, 80)).astype(np.uint8))
    paths.append(str(jp))
    return paths


class TestDecode:
    def test_png_matches_cv2(self, image_files):
        p = image_files[0]
        ours = decode_image(p, 64, 80)[..., 0]
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        np.testing.assert_allclose(ours, ref, atol=1 / 255.0 + 1e-6)

    def test_jpeg_decodes(self, image_files):
        p = image_files[-1]
        ours = decode_image(p, 64, 80)[..., 0]
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        assert np.abs(ours - ref).mean() < 0.02  # lossy codec tolerance

    def test_resize_close_to_cv2_area(self, image_files):
        p = image_files[1]
        ours = decode_image(p, 32, 40)[..., 0]
        raw = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        ref = cv2.resize(raw, (40, 32), interpolation=cv2.INTER_AREA)
        ref = ref.astype(np.float32) / 255.0
        assert np.abs(ours - ref).mean() < 0.01


class TestLoader:
    def test_drains_all_once(self, image_files):
        loader = NativeImageLoader(
            image_files, 32, 40, n_threads=3, loop=False, seed=1
        )
        seen = []
        for batch in loader.batches(3):
            assert batch["image"].shape[1:] == (32, 40, 1)
            seen.extend(batch["indices"].tolist())
        loader.close()
        assert sorted(seen) == list(range(len(image_files)))

    def test_loop_mode_continues(self, image_files):
        loader = NativeImageLoader(
            image_files, 16, 16, n_threads=2, loop=True, seed=2
        )
        total = 0
        it = loader.batches(4)
        for _ in range(5):  # more than one epoch worth
            batch = next(it)
            total += len(batch["image"])
        loader.close()
        assert total == 20

    def test_bad_file_flagged_not_crashing(self, tmp_path, image_files):
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not an image at all")
        loader = NativeImageLoader(
            [image_files[0], str(bad)], 16, 16, n_threads=1, loop=False
        )
        idx = []
        for batch in loader.batches(2):
            idx.extend(batch["indices"].tolist())
        loader.close()
        assert any(i < 0 for i in idx)  # failure marked
        assert any(i >= 0 for i in idx)


class TestALLSSNativeBackend:
    def test_native_batches_with_labels(self, tmp_path, image_files):
        import shutil

        from image_matching_tpu.data.datasets import ALLSSDataset

        root = tmp_path / "data" / "train"
        labels = tmp_path / "labels" / "train"
        root.mkdir(parents=True)
        labels.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i, src in enumerate(image_files[:4]):
            dst = root / f"im{i}.png"
            shutil.copy(src, dst)
            pts = rng.uniform(0, 30, (10, 3)).astype(np.float32)
            np.savez(labels / f"im{i}.npz", pts=pts)

        ds = ALLSSDataset(
            str(tmp_path / "data"), "train", str(tmp_path / "labels"),
            resize=(32, 40), max_points=16,
        )
        it = ds.batches(2, native=True, n_threads=2)
        batch = next(it)
        assert batch["image"].shape == (2, 32, 40, 1)
        assert batch["points"].shape == (2, 16, 2)
        assert batch["points_mask"][:, :10].all()
