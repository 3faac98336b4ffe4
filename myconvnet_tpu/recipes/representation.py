"""SSL, semi-supervised and distillation families.

Part of the recipes package — the reference's parameters.py + per-task
wiring (SURVEY.md §2#10) split by family; ``myconvnet_tpu.recipes``
re-exports every public name, so consumers are unchanged.
"""

from __future__ import annotations

import jax
import numpy as np

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.core.precision import get_policy, policy_scope
from myconvnet_tpu.data.pipeline import DataSet
from myconvnet_tpu.recipes.common import (make_augment,
                                          make_optimizer,
                                          make_sources)

def build_ssl(cfg: dict, synthetic: bool = False, mesh=None):
    """Self-supervised recipe wiring (the fifth task family, train/ssl.py).

    Returns ``(state, step, train_set, val_set, feats_fn, kind)``:
    ``step(state, x_u8_batch)`` is the fused jitted pretraining step;
    ``feats_fn(state, x_u8)`` embeds frozen features for the kNN probe
    (eval augmentation + features_only forward).  Labels flow through
    the DataSet untouched — pretraining ignores them, the probe uses
    them.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import (augment_eval, augment_train,
                                            normalize)
    from myconvnet_tpu.train import ssl as ssl_lib

    kind = cfg.get("ssl_kind", "simclr")
    policy = get_policy(cfg.get("precision", "f32"))
    aug = make_augment(cfg.get("augment"))
    if aug is None:
        raise ValueError("ssl configs need an 'augment' entry (the view "
                         "distribution is the method)")
    opt = make_optimizer(cfg["optimizer"])
    mkw = dict(cfg.get("model_kwargs", {}))

    if kind == "mae":
        if cfg["model"] not in models.SSL_MODELS:
            raise ValueError(f"ssl_kind='mae' needs an SSL_MODELS entry; "
                             f"valid: {sorted(models.SSL_MODELS)}")
        mae_fn = models.SSL_MODELS[cfg["model"]]

        def fwd(x, train=False, features_only=False):
            with policy_scope(policy):
                x = policy.cast_to_compute(x)
                return mae_fn(x, train=train,
                              features_only=features_only, **mkw)

        model = transform(fwd)

        def view_fn(key, x_u8):
            return augment_train(key, x_u8, aug)

        step = ssl_lib.make_mae_step(model, opt, view_fn)

    elif kind == "simclr":
        model_fn = models.get_model(cfg["model"])
        proj_dim = cfg.get("proj_dim", 128)
        proj_hidden = cfg.get("proj_hidden", None)
        gray_p = cfg.get("grayscale_prob", 0.2)
        # the view chain works on [0,1] floats; normalization moves to
        # the END so random grayscale sees real RGB
        raw_aug = aug._replace(mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))

        def fwd(x, train=False, features_only=False):
            from myconvnet_tpu import nn
            from myconvnet_tpu.core.module import collecting
            with policy_scope(policy):
                x = policy.cast_to_compute(x)
                # the backbone = any feature-tagging zoo classifier; its
                # 1-class head is dead code XLA prunes (output unused)
                with collecting() as c:
                    model_fn(x, 1, train=train, **mkw)
                feats = [v for k, v in c.items()
                         if k.endswith("/features")]
                if not feats:
                    raise ValueError(
                        f"model {cfg['model']!r} tags no 'features' "
                        f"intermediate; found {sorted(c)}")
                h = feats[-1]
                if h.ndim == 4:
                    h = nn.gap(h)
                if features_only:
                    return policy.cast_to_output(h)
                with nn.scope_named("projector"):
                    hidden = proj_hidden or h.shape[-1]
                    z = nn.relu(nn.dense(h, hidden, name="fc1"))
                    z = nn.dense(z, proj_dim, use_bias=False, name="fc2")
                return policy.cast_to_output(z)

        model = transform(fwd)

        def view_fn(key, x_u8, _raw=raw_aug, _final=aug, _p=gray_p):
            from myconvnet_tpu.data.augment import _rgb_to_gray
            k1, k2 = jax.random.split(key)
            x = augment_train(k1, x_u8, _raw)     # [0,1] floats
            if _p > 0.0:
                sel = jax.random.bernoulli(k2, _p,
                                           (x.shape[0], 1, 1, 1))
                x = jnp.where(sel, _rgb_to_gray(x), x)
            return normalize(x, _final.mean,
                             _final.std).astype(x.dtype)

        step = ssl_lib.make_simclr_step(
            model, opt, view_fn,
            temperature=cfg.get("temperature", 0.5))
    else:
        raise ValueError(f"unknown ssl_kind {kind!r}; valid: "
                         "['mae', 'simclr']")

    rng = jax.random.key(cfg.get("seed", 0))
    hw = tuple(aug.out_hw)
    sample = jnp.zeros((2, *hw, 3), policy.compute_dtype)
    from myconvnet_tpu.train.trainer import init_train_state
    state = init_train_state(model, opt, rng, sample)

    @jax.jit
    def _feats(params, mstate, x_u8):
        x = augment_eval(x_u8, aug)
        z, _ = model.apply(params, mstate, None, x, False,
                           features_only=True)
        return z

    def feats_fn(state, x_u8):
        return _feats(state.params, state.model_state, jnp.asarray(x_u8))

    train_src, val_src = make_sources(cfg, synthetic)
    return (state, step, DataSet(train_src, seed=cfg.get("seed", 0)),
            DataSet(val_src), feats_fn, kind)


# ------------------------------------------------------------ video


def build_semisup(cfg: dict, synthetic: bool = False, mesh=None):
    """FixMatch recipe wiring (eighth task family, train/semisup.py).

    Returns (state, step_fn, data_iter_fn, val_set, eval_fn).  The
    labeled split is ``labeled_per_class`` examples per class drawn
    from the train corpus (the paper's protocol — the unlabeled pool
    keeps everything); batches interleave 1 labeled : ``mu`` unlabeled.
    With ``mesh``, all three sub-batches shard over the data axis.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import augment_eval, augment_train
    from myconvnet_tpu.data.pipeline import ArraySource
    from myconvnet_tpu.train import semisup as semi_lib

    policy = get_policy(cfg.get("precision", "f32"))
    ncls = cfg["num_classes"]
    fn = models.get_model(cfg["model"])
    mkw = cfg.get("model_kwargs", {})

    def fwd(x, train=False):
        with policy_scope(policy):
            return fn(x.astype(policy.compute_dtype), ncls,
                      train=train, **mkw)

    model = transform(fwd)
    weak_aug = make_augment(cfg["augment"])
    strong_aug = make_augment(
        {**cfg["augment"], **cfg.get("augment_strong",
                                     dict(randaugment=(2, 10)))})

    def weak_fn(key, x_u8):
        return augment_train(key, x_u8, weak_aug)

    def strong_fn(key, x_u8):
        return augment_train(key, x_u8, strong_aug)

    opt = make_optimizer(cfg["optimizer"])
    hw = tuple(weak_aug.out_hw)
    state = semi_lib.init_semi_state(
        model, opt, jax.random.key(cfg.get("seed", 0)),
        jnp.zeros((2, *hw, 3), policy.compute_dtype))
    step = semi_lib.make_fixmatch_step(
        model, opt, weak_fn, strong_fn,
        threshold=cfg.get("threshold", 0.95),
        lambda_u=cfg.get("lambda_u", 1.0),
        ema_decay=cfg.get("ema_decay", 0.999))

    train_src, val_src = make_sources(cfg, synthetic)
    if not isinstance(train_src, ArraySource):
        raise ValueError("semisup needs an in-memory corpus "
                         "(ArraySource) to draw the labeled split")
    seed = cfg.get("seed", 0)
    x_lab, y_lab = semi_lib.labeled_subset(
        train_src.images, train_src.labels,
        cfg.get("labeled_per_class", 400), ncls, seed)
    lab_ds = DataSet(ArraySource(x_lab, y_lab), seed=seed)
    unlab_ds = DataSet(train_src, seed=seed + 1)
    mu = int(cfg.get("mu", 7))
    batch = cfg["batch_size"]

    def data_iter():
        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        li = lab_ds.train_iter(batch, device_put_fn=put)
        ui = unlab_ds.train_iter(mu * batch, device_put_fn=put)
        try:
            for (x_l, y_l), (x_u, _) in zip(li, ui):
                yield (x_l, y_l, x_u)
        finally:
            for it in (li, ui):
                if hasattr(it, "close"):
                    it.close()

    eval_fn = semi_lib.make_eval_fn(
        model, lambda x_u8: augment_eval(x_u8, weak_aug),
        use_ema=cfg.get("eval_ema", True))
    return state, step, data_iter, DataSet(val_src), eval_fn


# ------------------------------------------------- knowledge distillation

def make_policy_net(cfg: dict, name: str, mkw: dict):
    """``transform()`` of a zoo model under the recipe's precision
    policy — the shared wiring for distill's student/teacher and the
    student export path (test.py eval_distill); one definition so the
    exported artifact's forward cannot drift from the trained one."""
    policy = get_policy(cfg.get("precision", "f32"))
    ncls = cfg["num_classes"]
    fn = models.get_model(name)

    def fwd(x, train=False):
        with policy_scope(policy):
            return fn(x.astype(policy.compute_dtype), ncls,
                      train=train, **dict(mkw))

    return transform(fwd)


def build_distill(cfg: dict, synthetic: bool = False, mesh=None):
    """Knowledge-distillation recipe wiring (train/distill.py made a
    first-class task — the compress-the-zoo workflow: a trained
    teacher checkpoint supervises a smaller student through the fused
    teacher+student step).

    Returns ``(state, step_fn, data_iter_fn, val_set, eval_fn)`` — the
    run_semisup driver shape.  Config::

        task="distill", model="smallnet",        # the student
        distill=dict(
            teacher="resnet50",                  # teacher architecture
            teacher_kwargs={},                   # its model_kwargs
            ckpt="runs/r50/",                    # framework ckpt (dir
                                                 # or file) to load the
                                                 # teacher from, OR
            npz="weights.npz",                   # flat scope::name npz
            torch=dict(path="r50.pth", depth=50),  # torchvision file
            temperature=4.0, alpha=0.9),

    Exactly one of ``ckpt``/``npz``/``torch`` must be given — an
    untrained teacher distills noise, so there is no silent-random
    fallback (``allow_random=True`` overrides for tests/smoke runs).
    With ``mesh``, batches shard over the data axis and GSPMD carries
    both networks' compute.
    """
    import jax.numpy as jnp

    from myconvnet_tpu.data.augment import augment_eval, augment_train
    from myconvnet_tpu.train import distill as kd_lib
    from myconvnet_tpu.train.trainer import init_train_state

    dcfg = dict(cfg.get("distill") or {})
    if "teacher" not in dcfg:
        raise ValueError("task='distill' needs distill=dict(teacher=...)")

    student = make_policy_net(cfg, cfg["model"],
                              cfg.get("model_kwargs", {}))
    teacher = make_policy_net(cfg, dcfg["teacher"],
                              dcfg.get("teacher_kwargs", {}))
    policy = get_policy(cfg.get("precision", "f32"))

    aug = make_augment(cfg["augment"])
    hw = tuple(aug.out_hw)

    def augment_fn(key, x_u8, y):
        return augment_train(key, x_u8, aug), y

    opt = make_optimizer(cfg["optimizer"])
    seed = cfg.get("seed", 0)
    sample = jnp.zeros((2, *hw, 3), policy.compute_dtype)
    state0 = init_train_state(student, opt, jax.random.key(seed), sample)
    t_params, t_state = teacher.init(jax.random.key(seed + 1), sample,
                                     True)

    src = [k for k in ("ckpt", "npz", "torch") if dcfg.get(k)]
    if len(src) > 1:
        raise ValueError(f"distill teacher weights over-specified: {src}")
    if src == ["ckpt"]:
        from myconvnet_tpu.ckpt import checkpoint as ckpt_lib
        import warnings
        with warnings.catch_warnings():
            # the teacher template deliberately omits opt_state/step —
            # the "unused entries" warning is expected here
            warnings.filterwarnings(
                "ignore", message=".*entries the target has no slot.*")
            got = ckpt_lib.restore_checkpoint(
                dcfg["ckpt"], {"params": t_params, "model_state": t_state})
        t_params, t_state = got["params"], got["model_state"]
    elif src == ["npz"]:
        from myconvnet_tpu.models.pretrained import load_npz_weights
        t_params = load_npz_weights(dcfg["npz"], t_params)
    elif src == ["torch"]:
        from myconvnet_tpu.models.pretrained import import_torch_resnet_file
        tc = dict(dcfg["torch"])
        t_params, t_state = import_torch_resnet_file(
            tc["path"], t_params, t_state,
            depth=int(tc.get("depth", 50)),
            load_head=bool(tc.get("load_head", True)),
            prefix=tc.get("prefix", ""))
    elif not dcfg.get("allow_random"):
        raise ValueError(
            "distill= gives no teacher weights (ckpt=/npz=/torch=); a "
            "random teacher distills noise — pass allow_random=True "
            "only for smoke tests")

    state = kd_lib.DistillState(state0, t_params, t_state)
    step = kd_lib.make_distill_step(
        student, teacher, opt,
        temperature=float(dcfg.get("temperature", 4.0)),
        alpha=float(dcfg.get("alpha", 0.9)),
        augment_fn=augment_fn)

    train_src, val_src = make_sources(cfg, synthetic)
    train_ds = DataSet(train_src, seed=seed)
    batch = cfg["batch_size"]

    def data_iter():
        put = None
        if mesh is not None:
            from myconvnet_tpu.parallel import shard_batch
            put = lambda b: shard_batch(mesh, b)  # noqa: E731
        it = train_ds.train_iter(batch, device_put_fn=put)
        try:
            yield from it
        finally:
            if hasattr(it, "close"):
                it.close()

    @jax.jit
    def _pred(params, mstate, x_u8):
        x = augment_eval(x_u8, aug)
        logits, _ = student.apply(params, mstate, None, x, False)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    def eval_fn(state, batches) -> float:
        import numpy as np
        st = state.student
        correct = total = 0
        for x, y in batches:
            pred = np.asarray(_pred(st.params, st.model_state,
                                    jnp.asarray(x)))
            y = np.asarray(y)
            correct += int((pred[:len(y)] == y).sum())
            total += len(y)
        return correct / max(total, 1)

    return state, step, data_iter, DataSet(val_src), eval_fn


# ------------------------------------------------------ diffusion (ddpm)

