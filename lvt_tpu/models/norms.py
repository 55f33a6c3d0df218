"""Normalization layers, functional form (reference: vidgen/layers/batch_norm.py).

The shipped configs all run with ``NORM: ""`` (no norm), but the reference
exposes a name->norm factory (batch_norm.py:125-145) which we mirror:

  ""        -> identity
  "BN"      -> batch norm with running stats
  "SyncBN"  -> batch norm whose batch statistics are psum'd over the data
               mesh axis — the TPU-native NaiveSyncBatchNorm
               (batch_norm.py:163-232); no autograd Function needed, the
               psum differentiates itself
  "FrozenBN"-> inference-stats batch norm (batch_norm.py:12-122)
  "IN"      -> instance norm (nn.InstanceNorm2d default: affine=False —
               NO learnable params, parity with the reference factory which
               never passes affine=True)
  "GN"      -> group norm (32 groups)
  "StdN"    -> variance-only norm (batch_norm.py:235-243): x/sqrt(var+eps)
               with torch's UNBIASED spatial variance and no parameters.
               Reference quirk documented, not replicated: get_norm("StdN",
               out_channels) passes the channel count positionally into
               StdNorm2d(eps=...) so the reference's eps silently becomes
               the channel count (e.g. 64); we keep eps=1e-5.
  "StdNV2"  -> x * rsqrt(mean(x^2)+1e-8) (batch_norm.py:246-251); defined
               upstream but absent from its get_norm map — kept here as a
               usable extension, also parameterless

State (running mean/var) is threaded explicitly: apply returns (y, new_state).
Channels-last layouts: x is (..., C).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

VALID_NORMS = ("", "BN", "SyncBN", "nnSyncBN", "FrozenBN", "IN", "GN", "StdN", "StdNV2")


def init_norm(norm: str, num_features: int):
    """Returns (params, state) pytrees for a norm layer ('' -> ({}, {}))."""
    if norm in ("", "IN", "StdN", "StdNV2"):
        # IN/StdN/StdNV2 are parameterless in the reference (InstanceNorm2d
        # default affine=False; StdNorm2d defines no parameters)
        return {}, {}
    params = {"scale": jnp.ones((num_features,)), "bias": jnp.zeros((num_features,))}
    if norm in ("BN", "SyncBN", "nnSyncBN", "FrozenBN"):
        state = {"mean": jnp.zeros((num_features,)), "var": jnp.ones((num_features,))}
    else:
        state = {}
    return params, state


def apply_norm(
    norm: str,
    params: dict,
    state: dict,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, dict]:
    if norm == "":
        return x, state

    if norm == "IN":
        # per-sample spatial stats, no affine (nn.InstanceNorm2d default)
        spatial = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial, keepdims=True)
        var = jnp.var(x, axis=spatial, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps), state

    if norm == "StdN":
        # reference StdNorm2d: x / sqrt(var + eps), torch-default UNBIASED
        # variance over the spatial dims, no affine
        spatial = tuple(range(1, x.ndim - 1))
        var = jnp.var(x, axis=spatial, keepdims=True, ddof=1)
        return x * jax.lax.rsqrt(var + eps), state

    if norm == "StdNV2":
        spatial = tuple(range(1, x.ndim - 1))
        ms = jnp.mean(x * x, axis=spatial, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-8), state

    scale, bias = params["scale"], params["bias"]
    if norm == "FrozenBN":
        # the reference's FrozenBatchNorm keeps weight/bias as
        # NON-trainable buffers; they stay in params here for checkpoint
        # layout parity, so freeze them at the gradient level instead
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
    reduce_axes = tuple(range(x.ndim - 1))  # all but channel

    if norm in ("BN", "SyncBN", "nnSyncBN", "FrozenBN"):
        if train and norm != "FrozenBN":
            mean = jnp.mean(x, axis=reduce_axes)
            meansqr = jnp.mean(x * x, axis=reduce_axes)
            n = x.size // x.shape[-1]  # elements per channel, this shard
            synced = norm in ("SyncBN", "nnSyncBN") and axis_name is not None
            if synced:
                mean = jax.lax.pmean(mean, axis_name)
                meansqr = jax.lax.pmean(meansqr, axis_name)
                n = n * jax.lax.axis_size(axis_name)
            var = meansqr - mean * mean
            # running_var update: torch BatchNorm2d uses the UNBIASED batch
            # variance (n/(n-1)) while normalizing with the biased one; the
            # reference's NaiveSyncBatchNorm ("SyncBN") keeps the biased var
            # when actually synced (batch_norm.py:225-232) but falls back to
            # nn.BatchNorm2d semantics at world size 1 (:195-196).
            # nn.SyncBatchNorm ("nnSyncBN") count-corrects globally.
            if (norm == "BN" or norm == "nnSyncBN"
                    or (norm == "SyncBN" and not synced)) and n > 1:
                var_upd = var * (n / (n - 1))
            else:
                var_upd = var
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * jax.lax.stop_gradient(mean),
                "var": (1 - momentum) * state["var"] + momentum * jax.lax.stop_gradient(var_upd),
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
        return y, new_state

    if norm == "GN":
        groups = 32
        c = x.shape[-1]
        g = min(groups, c)
        while c % g != 0:
            g -= 1
        xs = x.reshape(x.shape[:-1] + (g, c // g))
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xs, axis=axes, keepdims=True)
        var = jnp.var(xs, axis=axes, keepdims=True)
        y = ((xs - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        return y * scale + bias, state

    raise ValueError(f"Unknown norm: {norm}")
