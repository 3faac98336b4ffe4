"""Dataset prep writers (subsets/prep.py) roundtrip through the readers."""

import os

import numpy as np
import pytest

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


def test_mnist_idx_roundtrip(tmp_path):
    """Write canonical IDX files, read them back through the subset."""
    import gzip
    import struct

    from myconvnet_tpu.subsets import mnist

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (12, 28, 28), np.uint8)
    labels = rs.randint(0, 10, 12).astype(np.uint8)

    def write_idx(path, arr, gz=False):
        header = struct.pack(">HBB", 0, 0x08, arr.ndim) + b"".join(
            struct.pack(">I", d) for d in arr.shape)
        opener = gzip.open if gz else open
        with opener(path + (".gz" if gz else ""), "wb") as f:
            f.write(header + arr.tobytes())

    # train plain, test gzipped — both container styles must parse
    write_idx(str(tmp_path / "train-images-idx3-ubyte"), imgs)
    write_idx(str(tmp_path / "train-labels-idx1-ubyte"), labels)
    write_idx(str(tmp_path / "t10k-images-idx3-ubyte"), imgs[:5], gz=True)
    write_idx(str(tmp_path / "t10k-labels-idx1-ubyte"), labels[:5], gz=True)

    x, y = mnist.read_subset(str(tmp_path), "train")
    assert x.shape == (12, 28, 28, 3) and x.dtype == np.uint8
    np.testing.assert_array_equal(x[..., 0], imgs)
    np.testing.assert_array_equal(x[..., 0], x[..., 2])  # replicated RGB
    np.testing.assert_array_equal(y, labels.astype(np.int32))
    xt, yt = mnist.read_subset(str(tmp_path), "test")
    assert xt.shape == (5, 28, 28, 3)

    with pytest.raises(FileNotFoundError):
        mnist.read_subset(str(tmp_path / "nope"), "train")


def test_mnist_synthetic_source():
    from myconvnet_tpu.subsets import mnist
    src = mnist.make_source(None, "train", synthetic=True, synthetic_n=64)
    x, y = src.get_batch(np.arange(8))
    assert x.shape == (8, 28, 28, 3) and x.dtype == np.uint8
    assert y.shape == (8,)
    # deterministic across calls
    src2 = mnist.make_source(None, "train", synthetic=True, synthetic_n=64)
    np.testing.assert_array_equal(x, src2.get_batch(np.arange(8))[0])


def test_pairs_unpaired_two_dir_layout(tmp_path):
    """CycleGAN mode: A/B pools with disjoint filenames must load
    (zipped by order, shorter pool wraps); paired mode still requires
    matching basenames."""
    from PIL import Image

    from myconvnet_tpu.subsets import pairs

    rs = np.random.RandomState(0)
    for d, names in (("A", ["horse_1.png", "horse_2.png", "horse_3.png"]),
                     ("B", ["zebra_9.png", "zebra_8.png"])):
        os.makedirs(tmp_path / d / "train")
        for nme in names:
            Image.fromarray(rs.randint(0, 256, (8, 8, 3), np.uint8)).save(
                str(tmp_path / d / "train" / nme))

    items, combined = pairs.read_subset(str(tmp_path), "train",
                                        paired=False)
    assert not combined and len(items) == 3  # max(|A|, |B|), B wraps
    assert items[2][1].endswith("zebra_8.png")  # sorted order, wrapped

    with pytest.raises(FileNotFoundError, match="matching"):
        pairs.read_subset(str(tmp_path), "train", paired=True)

    src = pairs.make_source(str(tmp_path), "train", raw_hw=(8, 8),
                            paired=False)
    a, b = src.get_batch(np.arange(3))
    assert a.shape == (3, 8, 8, 3) and b.shape == (3, 8, 8, 3)
