"""Muon / Scion optimizers as optax transformations + the 2-optimizer split.

Reference semantics reproduced:

- Muon (models/optimizers/muon.py:3-86): SGD-momentum with nesterov lerp,
  Newton-Schulz-5 orthogonalization of 2-D updates in bfloat16 (quintic
  coefficients 3.4445 / -4.7750 / 2.0315), shape scale
  max(1, rows/cols)^0.5, decoupled weight decay.
- Scion (models/optimizers/scion.py:186-269): momentum EMA
  buf <- (1-m)*buf + m*g, update = scale * lmo(buf) under a norm strategy
  (Auto: Spectral for 2-D via NS-5 with (d_out/d_in)^0.5 scale, BiasRMS
  for <=1-D); constrained mode multiplies params by (1 - lr).
- Optimizer split (generative_recommenders.py:296-320): params whose path
  contains "emb" or with ndim < 2 go to optimizer1 (AdamW); encoder
  matrices (ndim >= 2) go to optimizer2. Implemented with
  optax.multi_transform over path labels.

Everything is jit-pure; the learning rates are passed per-step so the
plateau controller can change them without recompiling (transforms are
rebuilt inside the jitted step from traced lr scalars).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mygenerativerecommenders_tpu.configs import OptimizerConfig


# --------------------------------------------------------------------------
# Newton-Schulz-5 orthogonalization (bf16), matching muon.py:3-29
# --------------------------------------------------------------------------


def zeropower_via_newtonschulz5(g: jax.Array, steps: int = 5) -> jax.Array:
    a, b, c = 3.4445, -4.7750, 2.0315
    transpose = g.shape[-2] > g.shape[-1]
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    x = x / (jnp.linalg.norm(x, axis=(-2, -1), keepdims=True).astype(jnp.bfloat16) + 1e-7)
    for _ in range(steps):
        xxt = x @ jnp.swapaxes(x, -1, -2)
        bmat = b * xxt + c * (xxt @ xxt)
        x = a * x + bmat @ x
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x


def _muon_shape_scale(shape) -> float:
    return max(1.0, shape[-2] / shape[-1]) ** 0.5


# --------------------------------------------------------------------------
# Muon
# --------------------------------------------------------------------------


class MuonState(NamedTuple):
    momentum: Any


def muon(
    learning_rate,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Muon for >=2-D params (others pass through as SGD-momentum)."""

    def init_fn(params):
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        del params

        def momentum_update(g, buf):
            return buf + (1.0 - momentum) * (g - buf)  # lerp_(grad, 1-beta)

        new_momentum = jax.tree.map(momentum_update, grads, state.momentum)

        def per_param(g, buf):
            upd = g + momentum * (buf - g) if nesterov else buf
            if upd.ndim >= 2:
                flat = upd.reshape(upd.shape[0], -1) if upd.ndim > 2 else upd
                orth = zeropower_via_newtonschulz5(flat, ns_steps)
                upd = (orth * _muon_shape_scale(flat.shape)).reshape(upd.shape)
            return upd.astype(g.dtype)

        updates = jax.tree.map(per_param, grads, new_momentum)
        return updates, MuonState(momentum=new_momentum)

    tx = optax.GradientTransformation(init_fn, update_fn)
    chain = [tx]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


# --------------------------------------------------------------------------
# Scion norm strategies (scion.py:12-201)
# --------------------------------------------------------------------------


def _scion_lmo(g: jax.Array, norm: str, ns_steps: int) -> jax.Array:
    eps = 1e-8
    if norm == "auto":
        if g.ndim >= 2:
            return _scion_lmo(g, "spectral", ns_steps)
        return _scion_lmo(g, "bias_rms", ns_steps)
    if norm == "spectral":
        flat = g.reshape(g.shape[0], -1) if g.ndim > 2 else g
        orth = zeropower_via_newtonschulz5(flat, ns_steps).astype(g.dtype)
        d_out, d_in = flat.shape
        return (orth * (d_out / d_in) ** 0.5).reshape(g.shape)
    if norm == "bias_rms":
        rms = jnp.sqrt(jnp.mean(g**2, axis=0, keepdims=True))
        return g / (rms + eps)
    if norm == "col":
        rms = jnp.sqrt(jnp.sum(g**2, axis=0, keepdims=True)) / (g.shape[0] ** 0.5)
        return g / (rms + eps)
    if norm == "row":
        rms = jnp.sqrt(jnp.sum(g**2, axis=-1, keepdims=True)) * (g.shape[-1] ** 0.5)
        return g / (rms + eps)
    if norm == "sign":
        return jnp.sign(g) / g.shape[-1]
    raise ValueError(f"Unknown scion norm {norm}")


class ScionState(NamedTuple):
    momentum: Any


def scion(
    learning_rate,
    momentum: float = 0.1,
    norm: str = "auto",
    scale: float = 1.0,
    unconstrained: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    """Scion: norm-constrained LMO steps (scion.py:215-269).

    update = -lr * scale * lmo(buf)  [+ -lr * p in constrained mode]
    """

    def init_fn(params):
        return ScionState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        def momentum_update(g, buf):
            return (1.0 - momentum) * buf + momentum * g

        bufs = (
            jax.tree.map(momentum_update, grads, state.momentum)
            if momentum != 1.0
            else grads
        )

        lr = learning_rate() if callable(learning_rate) else learning_rate

        def per_param(buf, p):
            upd = -lr * scale * _scion_lmo(buf, norm, ns_steps)
            if not unconstrained:
                upd = upd - lr * p
            return upd.astype(buf.dtype)

        if params is None:
            raise ValueError("scion requires params (constrained decay)")
        updates = jax.tree.map(per_param, bufs, params)
        new_state = ScionState(momentum=bufs if momentum != 1.0 else state.momentum)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


# --------------------------------------------------------------------------
# Factory + 2-optimizer split
# --------------------------------------------------------------------------


def build_single(cfg: OptimizerConfig, learning_rate) -> optax.GradientTransformation:
    if cfg.kind == "adamw":
        return optax.adamw(
            learning_rate=learning_rate,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    if cfg.kind == "muon":
        return muon(
            learning_rate=learning_rate,
            momentum=cfg.momentum,
            nesterov=cfg.nesterov,
            ns_steps=cfg.ns_steps,
            weight_decay=cfg.weight_decay,
        )
    if cfg.kind in ("scion", "scion_light"):
        return scion(
            learning_rate=learning_rate,
            momentum=cfg.momentum,
            norm=cfg.norm,
            scale=cfg.scale,
            unconstrained=cfg.unconstrained,
            ns_steps=cfg.ns_steps,
        )
    if cfg.kind == "sgd":
        return optax.sgd(learning_rate=learning_rate, momentum=cfg.momentum)
    raise ValueError(f"Unknown optimizer kind {cfg.kind}")


def param_labels(params) -> Any:
    """Label each param 'primary' (opt1) or 'matrix' (opt2).

    Split rule from generative_recommenders.py:296-310: "emb" in the name
    or ndim < 2 -> optimizer1; encoder matrices -> optimizer2. Params that
    the reference's rule would leave unoptimized (non-encoder >=2-D
    without "emb") are assigned to optimizer1 here.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path, leaf):
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        ).lower()
        if "emb" in path_str or leaf.ndim < 2:
            return "primary"
        if "encoder" in path_str:
            return "matrix"
        return "primary"

    labels = {path: label(path, leaf) for path, leaf in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [labels[p] for p, _ in flat]
    )


def scion_init_params(rng: jax.Array, params, labels, cfg: OptimizerConfig):
    """Norm-coupled re-initialization for Scion-managed params
    (Scion.init, scion.py:271-278 / Norm.init implementations).

    Spectral (2-D): orthogonal * (d_out/d_in)^0.5 * scale;
    BiasRMS (<=1-D): zeros. Applied only to leaves labeled 'matrix'.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_labels = jax.tree_util.tree_flatten(labels)[0]
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, leaf), label, key in zip(flat, flat_labels, keys):
        if label != "matrix":
            new_leaves.append(leaf)
            continue
        if leaf.ndim >= 2:
            flat_shape = (leaf.shape[0], int(np_prod(leaf.shape[1:])))
            w = jax.nn.initializers.orthogonal()(key, flat_shape, leaf.dtype)
            d_out, d_in = flat_shape
            w = w * ((d_out / d_in) ** 0.5) * cfg.scale
            new_leaves.append(w.reshape(leaf.shape))
        else:
            new_leaves.append(jnp.zeros_like(leaf))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def np_prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def build_optimizer(
    opt1: OptimizerConfig,
    opt2: Optional[OptimizerConfig],
    params,
    lr1,
    lr2,
) -> optax.GradientTransformation:
    """Single tx; with opt2 enabled, multi-transform over the split rule."""
    if opt2 is None or not opt2.enabled:
        return build_single(opt1, lr1)
    labels = param_labels(params)
    return optax.multi_transform(
        {"primary": build_single(opt1, lr1), "matrix": build_single(opt2, lr2)},
        labels,
    )
