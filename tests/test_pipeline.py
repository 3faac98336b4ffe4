import numpy as np
import pytest

from myconvnet_tpu.data.pipeline import (ArraySource, DataSet, Prefetcher,
                                         batch_indices)
from myconvnet_tpu.subsets import cifar10, imagenet, voc


def test_batch_indices_shuffles_per_epoch():
    batches_e1 = list(batch_indices(10, 5, shuffle=True, seed=0, epochs=1))
    batches_e2 = list(batch_indices(10, 5, shuffle=True, seed=0, epochs=2))
    assert len(batches_e1) == 2 and len(batches_e2) == 4
    # same seed -> first epoch identical; epochs differ from each other
    np.testing.assert_array_equal(batches_e1[0], batches_e2[0])
    order1 = np.concatenate(batches_e2[:2])
    order2 = np.concatenate(batches_e2[2:])
    assert sorted(order1) == sorted(order2) == list(range(10))
    assert not np.array_equal(order1, order2)


def test_batch_indices_drop_remainder():
    batches = list(batch_indices(10, 4, shuffle=False, seed=0, epochs=1))
    assert [len(b) for b in batches] == [4, 4]


def test_prefetcher_preserves_order_and_propagates_errors():
    src = [(np.full((2, 2), i), np.asarray([i])) for i in range(5)]
    out = list(Prefetcher(iter(src), depth=2))
    assert len(out) == 5
    for i, (x, y) in enumerate(out):
        assert int(y[0]) == i

    def bad_gen():
        yield src[0]
        raise RuntimeError("decode failed")

    it = Prefetcher(bad_gen(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in it:
            pass


def test_dataset_train_iter_epochs():
    imgs, labels = cifar10.synthetic_subset(16, 0)
    ds = DataSet(ArraySource(imgs, labels))
    batches = list(ds.train_iter(8, epochs=2, prefetch=0))
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (8, 32, 32, 3) and x.dtype == np.uint8
    assert y.shape == (8,)


def test_dataset_eval_iter_deterministic():
    imgs, labels = cifar10.synthetic_subset(16, 0)
    ds = DataSet(ArraySource(imgs, labels))
    a = [np.asarray(y) for _, y in ds.eval_iter(8, prefetch=0)]
    b = [np.asarray(y) for _, y in ds.eval_iter(8, prefetch=0)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_cifar10_synthetic_learnable_structure():
    imgs, labels = cifar10.synthetic_subset(256, 0)
    assert imgs.shape == (256, 32, 32, 3) and imgs.dtype == np.uint8
    # per-class means must differ (classes are separable)
    m0 = imgs[labels == 0].mean(axis=(0, 1, 2))
    m1 = imgs[labels == 1].mean(axis=(0, 1, 2))
    assert np.abs(m0 - m1).max() > 5.0


def test_imagenet_synthetic():
    imgs, labels = imagenet.synthetic_subset(4, raw_hw=(64, 64))
    assert imgs.shape == (4, 64, 64, 3)
    assert labels.max() < imagenet.NUM_CLASSES


def test_voc_synthetic_pairs():
    imgs, masks = voc.synthetic_subset(4, (48, 48))
    assert imgs.shape == (4, 48, 48, 3)
    assert masks.shape == (4, 48, 48)
    assert masks.max() < voc.NUM_CLASSES and masks.min() >= 0


def test_imagenet_read_subset_layout(tmp_path):
    import PIL.Image
    for split in ("train",):
        for cname in ("class_a", "class_b"):
            d = tmp_path / split / cname
            d.mkdir(parents=True)
            for i in range(2):
                PIL.Image.new("RGB", (8, 8)).save(d / f"img{i}.jpeg")
    paths, labels, classes = imagenet.read_subset(str(tmp_path), "train")
    assert len(paths) == 4
    assert classes == ["class_a", "class_b"]
    np.testing.assert_array_equal(labels, [0, 0, 1, 1])


def test_file_source_decodes(tmp_path):
    import PIL.Image
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        PIL.Image.new("RGB", (20, 10), color=(i * 10, 0, 0)).save(p)
        paths.append(str(p))
    from myconvnet_tpu.data.pipeline import FileSource
    src = FileSource(paths, [0, 1, 2], raw_hw=(8, 8), workers=2)
    x, y = src.get_batch(np.asarray([0, 2]))
    assert x.shape == (2, 8, 8, 3) and x.dtype == np.uint8
    np.testing.assert_array_equal(y, [0, 2])


def test_pairs_synthetic_and_file_layouts(tmp_path):
    from myconvnet_tpu.subsets import pairs
    import PIL.Image
    # synthetic: inverted targets
    a, b = pairs.synthetic_subset(4, (16, 16))
    np.testing.assert_array_equal(b, 255 - a)
    # combined layout: one 2W-wide image per example
    d = tmp_path / "train"
    d.mkdir()
    for i in range(3):
        arr = np.zeros((10, 20, 3), np.uint8)
        arr[:, :10] = i * 10       # A half
        arr[:, 10:] = 255 - i * 10  # B half
        PIL.Image.fromarray(arr).save(d / f"p{i}.png")
    src = pairs.make_source(str(tmp_path), "train", raw_hw=(10, 10))
    xa, xb = src.get_batch(np.asarray([0, 2]))
    assert xa.shape == (2, 10, 10, 3) and xb.shape == (2, 10, 10, 3)
    np.testing.assert_array_equal(xa[0], 0)
    np.testing.assert_array_equal(xb[0], 255)
    # two-dir layout
    for side in ("A", "B"):
        (tmp_path / side / "train").mkdir(parents=True)
        for i in range(2):
            PIL.Image.new("RGB", (8, 8), (i, 0, 0)).save(
                tmp_path / side / "train" / f"x{i}.png")
    src2 = pairs.make_source(str(tmp_path), "train", raw_hw=(8, 8))
    ya, yb = src2.get_batch(np.asarray([1]))
    assert ya.shape == (1, 8, 8, 3)


def test_pix2pix_recipe_data_iter():
    from myconvnet_tpu import recipes
    cfg = recipes.load_config("configs/pix2pix.py", batch_size=2)
    cfg["image_size"] = 32
    cfg["generator_kwargs"] = dict(base_features=8, n_levels=3)
    cfg["discriminator_kwargs"] = dict(base_features=8, n_layers=2)
    state, step, data_iter_fn, kind = recipes.build_gan(cfg,
                                                        synthetic=True)
    a, b = next(data_iter_fn())
    assert a.shape == (2, 32, 32, 3) and b.shape == (2, 32, 32, 3)
    assert a.min() >= -1.0 and a.max() <= 1.0
    new_state, m = step(state, (a, b))
    assert np.isfinite(float(m["g_l1"]))


def test_prefetcher_close_releases_worker():
    import itertools
    import threading
    before = threading.active_count()

    def infinite():
        for i in itertools.count():
            yield (np.zeros(2), np.asarray([i]))

    p = Prefetcher(infinite(), depth=2)
    next(p)
    p.close()
    p._thread.join(timeout=5)
    assert not p._thread.is_alive()
    # closed iterator terminates cleanly
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        next(p)


def test_sharded_source_partition():
    """Shards are disjoint, balanced, and cover the whole corpus."""
    import numpy as np
    from myconvnet_tpu.data.pipeline import ArraySource, ShardedSource

    n = 37
    images = np.arange(n, dtype=np.uint8).reshape(n, 1, 1, 1) * np.ones(
        (1, 2, 2, 3), np.uint8)
    labels = np.arange(n)
    src = ArraySource(images, labels)
    seen = []
    sizes = []
    for i in range(4):
        sh = ShardedSource(src, i, 4)
        sizes.append(len(sh))
        _, y = sh.get_batch(np.arange(len(sh)))
        seen.extend(y.tolist())
    assert sorted(seen) == list(range(n))
    assert max(sizes) - min(sizes) <= 1


def test_dataset_shard_and_identity():
    import numpy as np
    from myconvnet_tpu.data.pipeline import ArraySource, DataSet

    images = np.zeros((10, 2, 2, 3), np.uint8)
    labels = np.arange(10)
    ds = DataSet(ArraySource(images, labels), seed=7)
    assert ds.shard(None, None) is ds  # single-process: no-op
    s1 = ds.shard(1, 2)
    assert len(s1) == 5
    _, y = s1.source.get_batch(np.arange(5))
    assert y.tolist() == [1, 3, 5, 7, 9]
    import pytest
    with pytest.raises(ValueError):
        ds.shard(2, 2)


def test_process_local_put_equals_shard_batch():
    import jax
    import numpy as np
    from myconvnet_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(8, 1)
    x = np.random.RandomState(0).rand(16, 4).astype(np.float32)
    a = mesh_lib.shard_batch(mesh, (x,))[0]
    b = mesh_lib.process_local_put(mesh, (x,))[0]
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_indices_too_small_raises():
    """batch_size > dataset with drop_remainder must raise, not spin."""
    import pytest

    from myconvnet_tpu.data.pipeline import batch_indices
    with pytest.raises(ValueError, match="exceeds dataset"):
        list(batch_indices(4, 8, shuffle=False, seed=0,
                           drop_remainder=True, epochs=1))
    # without drop_remainder the short batch is yielded
    out = list(batch_indices(4, 8, shuffle=False, seed=0,
                             drop_remainder=False, epochs=1))
    assert len(out) == 1 and len(out[0]) == 4


def test_decode_image_native_crop_geometry(tmp_path):
    """native_crop keeps ORIGINAL pixels (no resample): the crop window
    placed by frac_yx must reproduce exact source pixels."""
    import PIL.Image

    from myconvnet_tpu.data.pipeline import decode_image_native
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (10, 20, 3), np.uint8)
    p = tmp_path / "img.png"
    PIL.Image.fromarray(arr).save(p)
    # center crop: y0 = 0.5*(10-6)=2, x0 = 0.5*(20-8)=6
    out = decode_image_native(str(p), (6, 8))
    np.testing.assert_array_equal(out, arr[2:8, 6:14])
    # corner crops via frac
    np.testing.assert_array_equal(
        decode_image_native(str(p), (6, 8), (0.0, 0.0)), arr[:6, :8])
    np.testing.assert_array_equal(
        decode_image_native(str(p), (6, 8), (1.0, 1.0)), arr[4:, 12:])
    # too-small source falls back to cover-resize (right shape, no crash)
    small = decode_image_native(str(p), (16, 16))
    assert small.shape == (16, 16, 3) and small.dtype == np.uint8


def test_file_source_native_crop_mode(tmp_path):
    import PIL.Image

    from myconvnet_tpu.data.pipeline import FileSource
    rng = np.random.RandomState(1)
    arrs, paths = [], []
    for i in range(3):
        a = rng.randint(0, 256, (12, 16, 3), np.uint8)
        p = tmp_path / f"im{i}.png"
        PIL.Image.fromarray(a).save(p)
        arrs.append(a)
        paths.append(str(p))
    # rand_crop=False -> deterministic center crops of original pixels
    src = FileSource(paths, [0, 1, 2], raw_hw=(8, 8), workers=2,
                     decode_mode="native_crop")
    x, y = src.get_batch(np.asarray([0, 2]))
    np.testing.assert_array_equal(x[0], arrs[0][2:10, 4:12])
    np.testing.assert_array_equal(x[1], arrs[2][2:10, 4:12])
    # rand_crop=True -> valid windows of original pixels
    src_r = FileSource(paths, [0, 1, 2], raw_hw=(8, 8), workers=2,
                       decode_mode="native_crop", rand_crop=True, seed=0)
    xr, _ = src_r.get_batch(np.asarray([1, 1, 1, 1]))
    assert xr.shape == (4, 8, 8, 3)
    for patch in xr:  # every patch must be a contiguous source window
        found = any(
            np.array_equal(patch, arrs[1][yy:yy + 8, xx:xx + 8])
            for yy in range(5) for xx in range(9))
        assert found
    import pytest
    with pytest.raises(ValueError, match="decode_mode"):
        FileSource(paths, [0, 1, 2], raw_hw=(8, 8),
                   decode_mode="bilinear")
