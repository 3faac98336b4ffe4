"""Shampoo (Gupta et al.) — full-matrix-per-axis preconditioning, the
canonical TPU second-order optimizer (the published large-scale runs are
TPU jobs; the eigendecompositions batch beautifully on the MXU).

Beyond the reference's optimizer family (SURVEY.md §2#6), included as
the framework's large-batch/production option next to LARS.  Scoped
implementation of the standard practical recipe:

* each parameter reshapes to a matrix G [m, n] (convs: [kh*kw*cin,
  cout]; vectors/scalars precondition diagonally);
* statistics L += G Gᵀ and R += Gᵀ G accumulate every step
  (UN-normalized running sums — the distributed-Shampoo convention;
  grafting makes the overall scale irrelevant, and the effective eps
  regularization therefore shrinks relative to L as training proceeds);
* every ``precond_every`` steps the inverse fourth roots
  P_L = (L + εI)^(-1/4), P_R = (R + εI)^(-1/4) refresh via a
  jittable symmetric eigendecomposition (f32), inside ``lax.cond`` so
  off-cadence steps cost two matmuls, not an eigh;
* the preconditioned gradient P_L G P_R is **grafted** to the SGD
  gradient norm (direction from Shampoo, step size from first-order —
  the standard stabilization), then momentum + weight decay apply;
* axes larger than ``max_dim`` fall back to the identity preconditioner
  (the other axis still preconditions) — the honest scalar-hardware cap
  in place of the full blocked partitioning.

``max_dim`` also bounds COMPILE weight: every preconditioned axis adds
an eigh branch to the single train program, and ~100 parameters x
2048-dim eighs is enough to OOM a constrained XLA compiler host
(observed on this environment's remote-compile relay).  256-512 keeps
the program light while preconditioning the channel axes that matter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from myconvnet_tpu.train.optim import (Optimizer, _decay_mask, _decayed,
                                       as_schedule)


class ShampooState(NamedTuple):
    stats_l: tuple      # per-param L (or () when axis capped)
    stats_r: tuple
    precond_l: tuple    # cached (L)^(-1/4)
    precond_r: tuple
    momentum: tuple


def _as_matrix(p: jax.Array) -> tuple[int, int] | None:
    """Collapse to [m, n] (last axis = n); None for rank<2 params."""
    if p.ndim < 2:
        return None
    n = p.shape[-1]
    m = int(p.size) // n
    return m, n


def _inv_fourth_root(s: jax.Array, eps: float) -> jax.Array:
    """(S + eps*I)^(-1/4) via eigh — symmetric PSD by construction."""
    d = s.shape[-1]
    w, v = jnp.linalg.eigh(s + eps * jnp.eye(d, dtype=s.dtype))
    return (v * jnp.maximum(w, eps) ** -0.25) @ v.T


def shampoo(lr, momentum_coef: float = 0.9, *,
            precond_every: int = 10, start_step: int | None = None,
            max_dim: int = 1024,
            eps: float = 1e-6, weight_decay: float = 0.0,
            weight_decay_exclude=None) -> Optimizer:
    """``start_step`` (default 2*precond_every): first-order until the
    statistics have enough rank — refreshing (L)^(-1/4) off one or two
    rank-1 outer products points the update into the eps-regularized
    null space (the standard start_preconditioning_step guard)."""
    sched = as_schedule(lr)
    if start_step is None:
        start_step = 2 * precond_every

    def init(params):
        leaves = jax.tree.leaves(params)
        stats_l, stats_r, pre_l, pre_r, mom = [], [], [], [], []
        for p in leaves:
            mn = _as_matrix(p)
            mom.append(jnp.zeros(p.shape, jnp.float32))
            if mn is None:
                stats_l.append(())
                stats_r.append(())
                pre_l.append(())
                pre_r.append(())
                continue
            m, n = mn
            stats_l.append(jnp.zeros((m, m), jnp.float32)
                           if m <= max_dim else ())
            stats_r.append(jnp.zeros((n, n), jnp.float32)
                           if n <= max_dim else ())
            pre_l.append(jnp.eye(m, dtype=jnp.float32)
                         if m <= max_dim else ())
            pre_r.append(jnp.eye(n, dtype=jnp.float32)
                         if n <= max_dim else ())
        return ShampooState(tuple(stats_l), tuple(stats_r),
                            tuple(pre_l), tuple(pre_r), tuple(mom))

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        treedef = jax.tree.structure(params)
        p_leaves = treedef.flatten_up_to(params)
        g_leaves = treedef.flatten_up_to(grads)
        mask = [bool(m) for m in jax.tree.leaves(
            _decay_mask(params, weight_decay_exclude))]
        started = step >= start_step
        refresh = jnp.logical_and(started, (step % precond_every) == 0)

        new_sl, new_sr, new_pl, new_pr, new_mom, new_p = \
            [], [], [], [], [], []
        for p, g, sl, sr, pl, pr, mom, dm in zip(
                p_leaves, g_leaves, opt_state.stats_l, opt_state.stats_r,
                opt_state.precond_l, opt_state.precond_r,
                opt_state.momentum, mask):
            gf = _decayed(g, p, weight_decay, dm)
            mn = _as_matrix(p)
            if mn is None:
                pg = gf  # rank<2: plain first-order
            else:
                m, n = mn
                gm = gf.reshape(m, n)
                has = lambda t: not isinstance(t, tuple)  # noqa: E731
                if has(sl):
                    sl = sl + gm @ gm.T
                    pl = jax.lax.cond(
                        refresh,
                        lambda s: _inv_fourth_root(s, eps),
                        lambda s, _pl=pl: _pl, sl)
                if has(sr):
                    sr = sr + gm.T @ gm
                    pr = jax.lax.cond(
                        refresh,
                        lambda s: _inv_fourth_root(s, eps),
                        lambda s, _pr=pr: _pr, sr)
                pg = gm
                if has(pl):
                    pg = pl @ pg
                if has(pr):
                    pg = pg @ pr
                # graft: Shampoo direction at the SGD step length;
                # pure first-order until preconditioning starts
                g_norm = jnp.linalg.norm(gm)
                pg_norm = jnp.maximum(jnp.linalg.norm(pg), 1e-16)
                pg = jnp.where(started, pg * (g_norm / pg_norm), gm)
                pg = pg.reshape(p.shape)
            m_new = momentum_coef * mom + pg
            new_p.append((p.astype(jnp.float32) - lr_t * m_new)
                         .astype(p.dtype))
            new_sl.append(sl)
            new_sr.append(sr)
            new_pl.append(pl)
            new_pr.append(pr)
            new_mom.append(m_new)

        return (jax.tree.unflatten(treedef, new_p),
                ShampooState(tuple(new_sl), tuple(new_sr),
                             tuple(new_pl), tuple(new_pr),
                             tuple(new_mom)))

    return Optimizer(init, update)


# --------------------------------------------------------------------------
# Blocked Shampoo (round 2, VERDICT r1 next #7): no more identity
# fallback on big axes — every matrix axis partitions into blocks and
# every block preconditions.
#
# TPU-native shape of the blocking: every tile of every parameter pads
# to ONE uniform [block, block] shape and the whole network's tiles
# stack into a single [T, block, block] array, so
#
# * the preconditioner refresh is ONE batched eigh over T tiles — one
#   lax.cond branch for the entire network (the per-param eigh zoo is
#   what OOM'd the constrained relay compiler in round 1), batching on
#   the MXU;
# * the statistics updates are two batched [T,b,b] matmuls;
# * the stacked tile axis is the natural mesh-sharding axis: pass
#   ``mesh=`` and the stats/preconditioners shard over the data axis,
#   so each chip eigh-refreshes only its tile shard (XLA inserts the
#   gathers where the preconditioned gradient is consumed).
#
# Padding a short axis to the block wastes eigh FLOPs on eps-identity
# lanes (harmless numerically: zero stat rows eigendecompose to
# eps^(-1/4) eigenvalues that multiply zero gradient entries) but buys
# the single-branch compile and uniform batching.
# --------------------------------------------------------------------------


class BlockedShampooState(NamedTuple):
    stats_l: jax.Array     # [T, b, b]
    stats_r: jax.Array     # [T, b, b]
    precond_l: jax.Array   # [T, b, b]
    precond_r: jax.Array   # [T, b, b]
    momentum: tuple        # per-param, param-shaped


def _tile_plan(shapes, block):
    """Static plan: per rank>=2 param, its matrix shape, block grid and
    slice of the stacked tile axis."""
    plan = []
    offset = 0
    for shape in shapes:
        if len(shape) < 2:
            plan.append(None)
            continue
        n = shape[-1]
        m = 1
        for d in shape[:-1]:
            m *= d
        bm = -(-m // block)
        bn = -(-n // block)
        plan.append((m, n, bm, bn, offset))
        offset += bm * bn
    return plan, offset


def _to_tiles(gm, m, n, bm, bn, block):
    """[m, n] -> [bm*bn, block, block] zero-padded tiles."""
    pad = jnp.zeros((bm * block, bn * block), gm.dtype)
    pad = pad.at[:m, :n].set(gm)
    t = pad.reshape(bm, block, bn, block).transpose(0, 2, 1, 3)
    return t.reshape(bm * bn, block, block)


def _from_tiles(t, m, n, bm, bn, block):
    pad = t.reshape(bm, bn, block, block).transpose(0, 2, 1, 3)
    return pad.reshape(bm * block, bn * block)[:m, :n]


def blocked_shampoo(lr, momentum_coef: float = 0.9, *,
                    block_size: int = 128,
                    precond_every: int = 10, start_step: int | None = None,
                    eps: float = 1e-6, weight_decay: float = 0.0,
                    weight_decay_exclude=None, mesh=None) -> Optimizer:
    """Blocked-partitioned Shampoo: like :func:`shampoo` but large axes
    precondition block-by-block instead of falling back to identity.
    Accumulated (un-normalized) statistics, grafted per tile to the
    first-order norm.  ``mesh``: optional jax.sharding.Mesh — stats and
    preconditioners shard their tile axis over the 'data' axis so the
    batched eigh refresh distributes across chips."""
    sched = as_schedule(lr)
    if start_step is None:
        start_step = 2 * precond_every
    b = int(block_size)

    def _shard(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data")))

    def init(params):
        leaves = jax.tree.leaves(params)
        plan, t_total = _tile_plan([p.shape for p in leaves], b)
        mom = tuple(jnp.zeros(p.shape, jnp.float32) for p in leaves)
        eye = jnp.broadcast_to(jnp.eye(b, dtype=jnp.float32),
                               (max(t_total, 1), b, b))
        zeros = jnp.zeros((max(t_total, 1), b, b), jnp.float32)
        return BlockedShampooState(zeros, zeros, eye, eye, mom)

    def update(grads, opt_state, params, step):
        lr_t = sched(step)
        treedef = jax.tree.structure(params)
        p_leaves = treedef.flatten_up_to(params)
        g_leaves = treedef.flatten_up_to(grads)
        mask = [bool(m) for m in jax.tree.leaves(
            _decay_mask(params, weight_decay_exclude))]
        plan, t_total = _tile_plan([p.shape for p in p_leaves], b)
        started = step >= start_step
        refresh = jnp.logical_and(started, (step % precond_every) == 0)

        decayed = [_decayed(g, p, weight_decay, dm)
                   for p, g, dm in zip(p_leaves, g_leaves, mask)]

        # stack every matrix param's tiles -> [T, b, b]
        tiles = [
            _to_tiles(gf.reshape(pl[0], pl[1]), *pl[:4], b)
            for gf, pl in zip(decayed, plan) if pl is not None]
        if tiles:
            gt = _shard(jnp.concatenate(tiles, axis=0))
            sl = _shard(opt_state.stats_l
                        + jnp.einsum("tij,tkj->tik", gt, gt))
            sr = _shard(opt_state.stats_r
                        + jnp.einsum("tji,tjk->tik", gt, gt))

            def _refresh(stats):
                return jax.vmap(lambda s: _inv_fourth_root(s, eps))(stats)

            pl_ = jax.lax.cond(refresh, _refresh,
                               lambda _s: opt_state.precond_l, sl)
            pr_ = jax.lax.cond(refresh, _refresh,
                               lambda _s: opt_state.precond_r, sr)
            pl_, pr_ = _shard(pl_), _shard(pr_)
            pg_t = jnp.einsum("tij,tjk,tkl->til", pl_, gt, pr_)
            # per-tile graft: Shampoo direction, first-order step length
            g_n = jnp.linalg.norm(gt, axis=(1, 2), keepdims=True)
            p_n = jnp.maximum(
                jnp.linalg.norm(pg_t, axis=(1, 2), keepdims=True), 1e-16)
            pg_t = jnp.where(started, pg_t * (g_n / p_n), gt)
        else:
            sl = opt_state.stats_l
            sr = opt_state.stats_r
            pl_ = opt_state.precond_l
            pr_ = opt_state.precond_r
            pg_t = None

        new_p, new_mom = [], []
        for p, gf, pl, mom in zip(p_leaves, decayed, plan,
                                  opt_state.momentum):
            if pl is None:
                pg = gf
            else:
                m, n, bm, bn, off = pl
                pg = _from_tiles(pg_t[off:off + bm * bn], m, n, bm, bn,
                                 b).reshape(p.shape)
            m_new = momentum_coef * mom + pg
            new_p.append((p.astype(jnp.float32) - lr_t * m_new)
                         .astype(p.dtype))
            new_mom.append(m_new)

        return (jax.tree.unflatten(treedef, new_p),
                BlockedShampooState(sl, sr, pl_, pr_, tuple(new_mom)))

    return Optimizer(init, update)
