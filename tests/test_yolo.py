"""YOLO raw-image pipeline tests over generated images + labels."""

import os

import cv2
import numpy as np
import pytest

from vqa_project_tpu.data.yolo import (
    ImageLabelDataset,
    InfiniteBatcher,
    LoadImages,
    augment_hsv,
    letterbox,
    mosaic4,
    random_perspective,
)
from vqa_project_tpu.data.yolo.augment import flip_lr
from vqa_project_tpu.data.yolo.loaders import img2label_paths


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """images/ + labels/ tree with synthetic boxes."""
    root = tmp_path_factory.mktemp("yolo")
    imgd = root / "images"
    lbld = root / "labels"
    imgd.mkdir()
    lbld.mkdir()
    rng = np.random.default_rng(3)
    for i in range(6):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(imgd / f"im{i}.jpg"), img)
        # 2 normalized cxcywh labels
        rows = []
        for _ in range(2):
            cw, ch = rng.uniform(0.1, 0.3, 2)
            cx = rng.uniform(cw / 2, 1 - cw / 2)
            cy = rng.uniform(ch / 2, 1 - ch / 2)
            rows.append(f"{int(rng.integers(0, 3))} {cx} {cy} {cw} {ch}")
        (lbld / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    return str(imgd)


def test_img2label_paths():
    p = os.sep.join(["d", "images", "x.jpg"])
    assert img2label_paths([p]) == [os.sep.join(["d", "labels", "x.txt"])]


def test_letterbox_shapes_and_gain(rng):
    img = rng.integers(0, 255, size=(200, 300, 3)).astype(np.uint8)
    out, ratio, pad = letterbox(img, 640, auto=False)
    assert out.shape == (640, 640, 3)
    assert ratio[0] == pytest.approx(640 / 300)
    # auto mode pads only to stride multiples
    out2, _, _ = letterbox(img, 640, auto=True, stride=32)
    assert out2.shape[0] % 32 == 0 and out2.shape[1] % 32 == 0


def test_hsv_preserves_shape_dtype(rng):
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    out = augment_hsv(img, np.random.default_rng(0))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_flip_lr_labels(rng):
    img = rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)
    labels = np.array([[0, 20, 10, 60, 50]], np.float32)
    _, flipped = flip_lr(img, labels.copy())
    assert flipped[0, 1] == 200 - 60 and flipped[0, 3] == 200 - 20


def test_mosaic_combines_labels(rng):
    imgs = [rng.integers(0, 255, size=(100, 100, 3)).astype(np.uint8)
            for _ in range(4)]
    lbs = [np.array([[0, 10, 10, 50, 50]], np.float32) for _ in range(4)]
    canvas, labels = mosaic4(imgs, lbs, 100, np.random.default_rng(0))
    assert canvas.shape == (200, 200, 3)
    assert len(labels) == 4
    assert labels[:, 1:].max() <= 200


def test_random_perspective_keeps_valid_boxes(rng):
    img = rng.integers(0, 255, size=(200, 200, 3)).astype(np.uint8)
    labels = np.array([[0, 50, 50, 150, 150]], np.float32)
    out, lb = random_perspective(img, labels, np.random.default_rng(0),
                                 degrees=5, translate=0.05, scale=0.1)
    assert out.shape == (200, 200, 3)
    assert lb.shape[1] == 5
    if len(lb):
        assert (lb[:, 1:] >= 0).all() and (lb[:, 1:] <= 200).all()


def test_load_images_iterator(image_dir):
    loader = LoadImages(image_dir, img_size=320)
    items = list(loader)
    assert len(items) == 6
    path, chw, img0, cap = items[0]
    assert chw.shape[0] == 3
    assert chw.shape[1] % 32 == 0 and chw.shape[2] % 32 == 0
    assert cap is None


def test_image_label_dataset_cache_and_getitem(image_dir):
    ds = ImageLabelDataset(image_dir, img_size=320, augment=False)
    assert len(ds) == 6
    img, labels = ds[0]
    assert img.shape == (3, 320, 320)
    assert labels.shape[1] == 5
    assert (labels[:, 1:] <= 320).all()
    # cache file created; second construction reuses it
    cache = os.path.join(os.path.dirname(image_dir), "labels",
                         "_labels.cache.npz")
    assert os.path.exists(cache)
    mtime = os.path.getmtime(cache)
    ds2 = ImageLabelDataset(image_dir, img_size=320)
    assert os.path.getmtime(cache) == mtime


def test_exif_rotated_shape_and_corrupt_detection(tmp_path):
    """Label-cache shapes must be EXIF-orientation-corrected
    (yolo_datasets.py:43-55) and corrupt files must raise (:472-475)."""
    from PIL import Image

    from vqa_project_tpu.data.yolo.loaders import exif_size

    imgd = tmp_path / "images"
    lbld = tmp_path / "labels"
    imgd.mkdir()
    lbld.mkdir()
    # 200x100 (w x h) image tagged rotation=6 -> effective size 100x200
    im = Image.new("RGB", (200, 100))
    ex = Image.Exif()
    ex[0x0112] = 6
    im.save(str(imgd / "rot.jpg"), exif=ex)
    (lbld / "rot.txt").write_text("0 0.5 0.5 0.2 0.2\n")

    with Image.open(str(imgd / "rot.jpg")) as img:
        assert exif_size(img) == (100, 200)

    ds = ImageLabelDataset(str(imgd), img_size=64, augment=False)
    assert tuple(ds.shapes[0]) == (100.0, 200.0)

    # corrupt image -> AssertionError while building the cache
    (imgd / "bad.jpg").write_bytes(b"\xff\xd8 not a real jpeg")
    (lbld / "bad.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    with pytest.raises(AssertionError, match="corrupt image"):
        ImageLabelDataset(str(imgd), img_size=64, augment=False)


def test_webcam_pipe_parses_without_eval():
    """'0'.isnumeric() pipes must parse via int(), not eval()."""
    from vqa_project_tpu.data.yolo.loaders import LoadWebcam

    try:
        cam = LoadWebcam("0", img_size=64)
    except Exception:
        pytest.skip("no camera device in CI")
    assert cam.pipe == 0


def test_augmented_pipeline_and_infinite_batcher(image_dir):
    hyp = {"mosaic": 1.0, "mixup": 0.5, "fliplr": 0.5, "flipud": 0.2,
           "cutout": 0.5, "scale": 0.3}
    ds = ImageLabelDataset(image_dir, img_size=160, augment=True, hyp=hyp,
                           seed=5)
    img, labels = ds[0]
    # mosaic builds a 2x canvas, then random_perspective's negative
    # border crops back to img_size
    assert img.shape == (3, 160, 160)
    it = iter(InfiniteBatcher(ds, batch_size=4, seed=1))
    for _ in range(3):
        imgs, batch_labels = next(it)
        assert imgs.shape[0] == 4 and imgs.dtype == np.uint8
        assert batch_labels.shape[1] == 6
        if len(batch_labels):
            assert batch_labels[:, 0].max() < 4


def test_rect_batches(image_dir):
    ds = ImageLabelDataset(image_dir, img_size=320, rect=True,
                           batch_size=2)
    img, _ = ds[0]
    assert img.shape[1] % 32 == 0 and img.shape[2] % 32 == 0
    # deterministic augmentation given same seed
    d1 = ImageLabelDataset(image_dir, img_size=160, augment=True, seed=9)
    d2 = ImageLabelDataset(image_dir, img_size=160, augment=True, seed=9)
    np.testing.assert_array_equal(d1[1][0], d2[1][0])
