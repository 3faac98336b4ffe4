"""Dataset prep writers (subsets/prep.py) roundtrip through the readers."""

import numpy as np

from myconvnet_tpu.subsets import imagenet, prep, voc


def test_class_dirs_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (12, 24, 24, 3), dtype=np.uint8)
    labels = rng.randint(0, 3, 12)
    n = prep.save_as_class_dirs(images, labels, str(tmp_path), "train",
                                class_names=["cat", "dog", "fox"])
    assert n == 12
    paths, read_labels, classes = imagenet.read_subset(str(tmp_path),
                                                       "train")
    assert classes == ["cat", "dog", "fox"]
    assert len(paths) == 12
    # readers sort by class then filename; label multiset must match
    assert sorted(read_labels.tolist()) == sorted(labels.tolist())
    # png roundtrip is lossless: check one pixel-exact file
    from PIL import Image
    i0 = int(np.where(labels == read_labels[0])[0][0])
    del i0  # order differs; just decode the first listed file
    arr = np.asarray(Image.open(paths[0]))
    assert arr.shape == (24, 24, 3)
    src_for_class = images[labels == read_labels[0]]
    assert any(np.array_equal(arr, s) for s in src_for_class)


def test_segmentation_pairs_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    masks = rng.randint(0, 5, (4, 32, 32)).astype(np.int32)
    masks[0, :4, :4] = 255  # ignore-label region survives
    n = prep.save_segmentation_pairs(images, masks, str(tmp_path), "train")
    assert n == 4
    src = voc.make_source(str(tmp_path), "train", raw_hw=(32, 32))
    x, y = src.get_batch(np.arange(4))
    assert x.shape == (4, 32, 32, 3)
    assert y.shape == (4, 32, 32)
    # masks are palette-free PNGs: values roundtrip exactly
    np.testing.assert_array_equal(np.sort(np.unique(y)),
                                  np.sort(np.unique(masks)))
