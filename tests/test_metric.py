"""Metric-learning family (tenth task family; reference mount empty,
SURVEY.md §0): ArcFace/CosFace margin losses, batch-hard triplet, the
PK identity-balanced sampler, the embedding model's train/eval duality,
leave-one-out retrieval evaluation, and the build_metric recipe
end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myconvnet_tpu import recipes
from myconvnet_tpu.core.module import transform
from myconvnet_tpu.data.pipeline import (ArraySource, DataSet,
                                         ShardedSource, pk_batch_indices)
from myconvnet_tpu.eval.retrieval import RetrievalEvaluator
from myconvnet_tpu.models.embedding import l2_normalize, tinyembed
from myconvnet_tpu.train.metric_losses import (arcface_loss,
                                               batch_hard_triplet_loss,
                                               cosface_loss,
                                               pairwise_distances)


# ------------------------------------------------------------- margin losses

def _random_cosines(n, c, seed=0):
    rng = np.random.RandomState(seed)
    e = rng.randn(n, 8)
    w = rng.randn(8, c)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    w /= np.linalg.norm(w, axis=0, keepdims=True)
    return jnp.asarray((e @ w).astype(np.float32))


def _plain_ce(cos, y, s):
    logits = s * np.asarray(cos, np.float64)
    logits -= logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(y)), np.asarray(y)].mean()


def test_arcface_zero_margin_is_scaled_ce():
    cos = _random_cosines(16, 10)
    y = jnp.asarray(np.arange(16) % 10)
    got = float(arcface_loss(cos, y, s=64.0, m=0.0))
    want = _plain_ce(cos, y, 64.0)
    assert abs(got - want) < 1e-4


def test_cosface_zero_margin_is_scaled_ce():
    cos = _random_cosines(16, 10, seed=1)
    y = jnp.asarray(np.arange(16) % 10)
    got = float(cosface_loss(cos, y, s=30.0, m=0.0))
    assert abs(got - _plain_ce(cos, y, 30.0)) < 1e-4


def test_margins_increase_loss():
    # the margin shrinks the target logit, so loss must strictly grow
    cos = _random_cosines(32, 20, seed=2)
    y = jnp.asarray(np.arange(32) % 20)
    assert float(arcface_loss(cos, y, m=0.5)) \
        > float(arcface_loss(cos, y, m=0.0))
    assert float(cosface_loss(cos, y, m=0.35)) \
        > float(cosface_loss(cos, y, m=0.0))


def test_arcface_margin_is_angular():
    # for a single pair with theta known, target logit is cos(theta+m)
    theta = 0.7
    cos = jnp.asarray([[np.cos(theta), 0.1]], jnp.float32)
    y = jnp.asarray([0])
    s, m = 4.0, 0.5
    got = float(arcface_loss(cos, y, s=s, m=m))
    logits = np.array([s * np.cos(theta + m), s * 0.1])
    want = -(logits[0] - np.log(np.exp(logits).sum()))
    assert abs(got - want) < 1e-5


def test_margin_losses_have_finite_grads():
    # cos == +-1 puts sqrt(1-cos^2) at 0, where naive grads are inf
    cos = jnp.asarray([[1.0, -1.0], [-1.0, 1.0]], jnp.float32)
    y = jnp.asarray([0, 1])
    g = jax.grad(lambda c: arcface_loss(c, y))(cos)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------------ triplet

def test_pairwise_distances_matches_bruteforce():
    rng = np.random.RandomState(0)
    e = rng.randn(10, 5).astype(np.float32)
    d = np.asarray(pairwise_distances(jnp.asarray(e)))
    want = np.linalg.norm(e[:, None] - e[None, :], axis=-1)
    np.testing.assert_allclose(d, want, atol=1e-4)


def test_batch_hard_handpicked():
    # 1-d embeddings at 0, 1, 5, 6 with labels a, a, b, b.  Every
    # anchor's hardest positive is d=1; hardest negatives are 5, 4, 4,
    # 5 -> per-anchor hinges (1-5+m, 1-4+m, 1-4+m, 1-5+m)
    emb = jnp.asarray([[0.0], [1.0], [5.0], [6.0]])
    y = jnp.asarray([0, 0, 1, 1])
    assert float(batch_hard_triplet_loss(emb, y, margin=0.3)) \
        == pytest.approx(0.0, abs=1e-6)
    assert float(batch_hard_triplet_loss(emb, y, margin=3.5)) \
        == pytest.approx(0.25, abs=1e-5)


def test_batch_hard_masks_invalid_anchors():
    # all labels distinct: no positives anywhere -> loss exactly 0
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    y = jnp.arange(6)
    assert float(batch_hard_triplet_loss(emb, y)) == 0.0
    g = jax.grad(lambda e: batch_hard_triplet_loss(e, y))(emb)
    assert np.all(np.isfinite(np.asarray(g)))


def test_soft_margin_variant():
    emb = jnp.asarray([[0.0], [1.0], [5.0], [6.0]])
    y = jnp.asarray([0, 0, 1, 1])
    # mean of softplus over per-anchor gaps (-4, -3, -3, -4)
    want = (np.log1p(np.exp(-4.0)) + np.log1p(np.exp(-3.0))) / 2
    assert float(batch_hard_triplet_loss(emb, y, soft=True)) \
        == pytest.approx(want, abs=1e-5)


# --------------------------------------------------------------- PK sampler

def test_pk_batches_are_identity_balanced():
    labels = np.repeat(np.arange(12), 10)
    it = pk_batch_indices(labels, 4, 3, seed=0)
    for _ in range(6):
        idx = next(it)
        assert idx.shape == (12,)
        y = labels[idx]
        classes, counts = np.unique(y, return_counts=True)
        assert len(classes) == 4 and np.all(counts == 3)


def test_pk_small_class_replacement_and_determinism():
    labels = np.asarray([0] * 10 + [1] * 2 + [2] * 10)  # class 1 < k
    a = [next(pk_batch_indices(labels, 3, 4, seed=7)) for _ in range(2)]
    b = [next(pk_batch_indices(labels, 3, 4, seed=7)) for _ in range(2)]
    np.testing.assert_array_equal(a[0], b[0])
    y = labels[a[0]]
    assert np.all(np.unique(y, return_counts=True)[1] == 4)
    with pytest.raises(ValueError, match="classes"):
        next(pk_batch_indices(labels, 5, 2, seed=0))


def test_sharded_source_exposes_label_view():
    imgs = np.zeros((20, 2, 2, 3), np.uint8)
    labels = np.arange(20) % 5
    shard = ShardedSource(ArraySource(imgs, labels), 1, 2)
    np.testing.assert_array_equal(shard.labels,
                                  labels[np.arange(1, 20, 2)])


def test_dataset_pk_train_iter():
    imgs = np.zeros((30, 2, 2, 3), np.uint8)
    labels = np.repeat(np.arange(5), 6)
    ds = DataSet(ArraySource(imgs, labels), pk=(2, 3))
    batch = next(ds.train_iter(6, prefetch=0))
    y = np.asarray(batch[1])
    classes, counts = np.unique(y, return_counts=True)
    assert len(classes) == 2 and np.all(counts == 3)
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.train_iter(8, prefetch=0))


# ----------------------------------------------------------- embedding model

def test_tinyembed_train_eval_duality():
    # random input: all-zero pixels give an all-zero (un-normalizable)
    # embedding through the bias-free BN trunk
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3),
                    jnp.float32)
    t = transform(lambda a, train=False: tinyembed(a, 8, train=train))
    params, state = t.init(jax.random.key(0), x, True)
    cos, _ = t.apply(params, state, jax.random.key(1), x, True)
    assert cos.shape == (4, 8)
    assert float(jnp.max(jnp.abs(cos))) <= 1.0 + 1e-5  # true cosines
    emb, _ = t.apply(params, state, None, x, False)
    assert emb.shape == (4, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)


def test_tinyembed_triplet_head_returns_embeddings_in_train():
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    t = transform(lambda a, train=False: tinyembed(a, 8, train=train,
                                                   head="triplet"))
    params, state = t.init(jax.random.key(0), x, True)
    out, _ = t.apply(params, state, jax.random.key(1), x, True)
    assert out.shape == (2, 32)


def test_l2_normalize_zero_safe():
    out = l2_normalize(jnp.zeros((2, 4)))
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------- retrieval

def _clustered_embeddings(per=4, ids=3, noise=0.05, seed=0):
    rng = np.random.RandomState(seed)
    centers = np.eye(ids, 8, dtype=np.float32) * 4
    embs = np.concatenate([centers[i] + noise * rng.randn(per, 8)
                           for i in range(ids)]).astype(np.float32)
    return embs, np.repeat(np.arange(ids), per)


def test_retrieval_perfect_clusters():
    ev = RetrievalEvaluator(1)
    embs, y = _clustered_embeddings()
    ev.update(embs[:7], y[:7])  # multi-batch accumulation
    ev.update(embs[7:], y[7:])
    assert ev.score() == pytest.approx(1.0)
    assert ev.recall_at(4) == pytest.approx(1.0)
    assert ev.mean_average_precision() == pytest.approx(1.0)


def test_retrieval_singletons_excluded():
    # a lone identity can never be matched; it must not drag the score
    embs, y = _clustered_embeddings(per=3, ids=2)
    lone = np.full((1, 8), 9.0, np.float32)
    ev = RetrievalEvaluator(1)
    ev.update(np.concatenate([embs, lone]), np.concatenate([y, [99]]))
    assert ev.score() == pytest.approx(1.0)


def test_metric_sources_honor_raw_hw():
    # regression: raw_hw used to be forwarded only for dataset=
    # 'images', so the ArcFace recipe's 128x128 aligned-face decode
    # silently fell back to the 256x256 imagenet default
    cfg = _tiny_cfg(dataset="imagenet", raw_hw=(40, 40),
                    num_classes=1000)
    tr, _va = recipes.make_sources(cfg, synthetic=True)
    x, _y = tr.get_batch(np.arange(2))
    assert x.shape[1:3] == (40, 40)


def test_retrieval_single_example_gallery():
    # regression: one accumulated embedding used to crash _ranked_hits
    # (k clamped to 0, zero-width broadcast); must score 0.0 cleanly
    ev = RetrievalEvaluator(1)
    ev.update(np.ones((1, 4), np.float32), np.asarray([3]))
    assert ev.score() == 0.0
    assert ev.mean_average_precision() == 0.0
    assert "recall@1: 0.0000" in ev.report()


def test_retrieval_report_matches_individual_metrics():
    # report() shares one ranked pass across all K; numbers must equal
    # the individually-computed metrics exactly
    embs, y = _clustered_embeddings(per=4, ids=3)
    ev = RetrievalEvaluator(1)
    ev.update(embs, y)
    rep = ev.report()
    for k in (1, 2, 4, 8):
        assert f"recall@{k}: {ev.recall_at(k):.4f}" in rep
    assert f"mAP@R: {ev.mean_average_precision():.4f}" in rep


def test_retrieval_known_miss():
    # two identities, one contaminated point sitting in the other cluster
    embs = np.asarray([[1, 0], [1, 0.01], [0, 1], [0.01, 1], [0.05, 1]],
                      np.float32)
    y = np.asarray([0, 0, 1, 1, 0])
    ev = RetrievalEvaluator(1)
    ev.update(embs, y)
    # queries 0, 1 hit each other; 2, 3 hit; 4's nearest is identity 1
    assert ev.score() == pytest.approx(4 / 5)
    assert ev.is_better(0.9, 0.8)


def test_retrieval_rejects_logits():
    ev = RetrievalEvaluator(1)
    with pytest.raises(ValueError, match="embeddings"):
        ev.update(np.zeros((2, 3, 4), np.float32), np.zeros(2))


# ------------------------------------------------------------------- recipe

def _tiny_cfg(**over):
    cfg = dict(task="metric", model="embedding_net",
               model_kwargs=dict(backbone="smallnet", embed_dim=16,
                                 head="triplet",
                                 backbone_kwargs=dict(width=8)),
               dataset="cifar10", data_dir=None, num_classes=10,
               triplet_margin=0.3, pk=(4, 4), recall_k=1,
               input_hw=(32, 32), batch_size=16, total_steps=3,
               val_every=0,
               optimizer=dict(name="adam", lr=1e-3),
               augment=dict(out_hw=(32, 32), area_range=None, flip=True,
                            mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
               precision="f32", seed=0)
    cfg.update(over)
    return cfg


def test_build_metric_validates_config():
    with pytest.raises(ValueError, match="identity-balanced"):
        recipes.build_metric(_tiny_cfg(pk=None), synthetic=True)
    with pytest.raises(ValueError, match="batch_size"):
        recipes.build_metric(_tiny_cfg(pk=(4, 2)), synthetic=True)
    bad = _tiny_cfg()
    bad["model_kwargs"]["head"] = "contrastive"
    with pytest.raises(ValueError, match="metric_head|head"):
        recipes.build_metric(bad, synthetic=True)
    # degenerate PK shapes silently zero the triplet loss: reject
    with pytest.raises(ValueError, match="K >= 2"):
        recipes.build_metric(_tiny_cfg(pk=(16, 1)), synthetic=True)
    with pytest.raises(ValueError, match="P >= 2"):
        recipes.build_metric(_tiny_cfg(pk=(1, 16)), synthetic=True)


def test_metric_evaluator_selected():
    ev = recipes.build_evaluator({"task": "metric", "recall_k": 2})
    assert isinstance(ev, RetrievalEvaluator) and ev.k == 2


@pytest.mark.slow
def test_triplet_trains_and_separates():
    cfg = _tiny_cfg(total_steps=40)
    net, train_set, val_set = recipes.build_metric(cfg, synthetic=True)
    ev = recipes.build_evaluator(cfg)
    before = net.evaluate(val_set, ev, batch_size=64)
    net.train(train_set, batch_size=16, total_steps=40)
    after = net.evaluate(val_set, ev, batch_size=64)
    assert np.isfinite(after)
    # synthetic cifar is class-separable; 40 steps must beat the
    # untrained embedding's retrieval
    assert after >= before


@pytest.mark.slow
def test_arcface_trains():
    cfg = _tiny_cfg(total_steps=10, pk=None, margin_s=16.0, margin_m=0.2)
    cfg["model_kwargs"]["head"] = "arcface"
    net, train_set, val_set = recipes.build_metric(cfg, synthetic=True)
    state = net.train(train_set, batch_size=16, total_steps=10)
    assert state is not None


def test_export_metric_traces_at_augment_out_hw(monkeypatch, tmp_path):
    """export_metric must size the artifact from the augment config's
    out_hw (what eval actually feeds the net), not input_hw — a
    mismatch serves embeddings at a resolution never used in eval."""
    import types

    from myconvnet_tpu import export_cli, serving

    seen = {}

    def fake_export(model, params, state, sample, path, **kw):
        seen["shape"] = np.shape(sample)
        return 1

    monkeypatch.setattr(serving, "export_inference", fake_export)
    net = types.SimpleNamespace(
        _transformed=None,
        state=types.SimpleNamespace(params=None, model_state=None))
    cfg = dict(input_hw=(24, 24), augment=dict(out_hw=(20, 20)),
               model_kwargs=dict(embed_dim=8), export_batch=2)
    args = types.SimpleNamespace(int8=False,
                                 export=str(tmp_path / "m.stablehlo"))
    export_cli.export_metric(cfg, args, net, val_set=None)
    assert seen["shape"] == (2, 20, 20, 3)
