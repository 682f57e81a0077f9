"""Deep residual OpenMax classifier with class-anchor clustering.

Parity target: AdvancedOpenMaxClassifier and its runtime forward path
(/root/reference/src/models/classifier.py:155-305). The executed traversal is:

  input_projection (Linear -> LN -> ReLU -> Dropout)
  for each of 35 layers: x = LN_i(x); x = x + block_i(x)
      where block_i = LN -> Linear -> ReLU -> Dropout -> Linear -> Dropout
  features = output_projection[0..3] (Linear(base, base//2) -> LN -> ReLU -> Drop)
  logits   = output_projection[4] (Linear(base//2, C))
  anchor similarities/loss from ClassAnchorClustering (classifier.py:8-70)
  uncertainty head (Linear -> ReLU -> Drop -> Linear -> sigmoid)
  inference-only OpenMax Weibull adjustment (classifier.py:240-275)

TPU-first design: the 35 residual layers are *stacked* into single [L, ...]
parameter arrays and traversed with `lax.scan`, so XLA compiles one fused
block instead of 35 unrolled ones, with optional `jax.checkpoint` remat that
is actually effective (the reference's checkpoint call at classifier.py:149-151
is dead code on the runtime path — documented in SURVEY.md §7).

The known-no-op anchor "pull" loss (clamp(sim - max_sim, 0) == 0, reference
classifier.py:55-70) is kept for loss-surface compatibility.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import openmax as openmax_ops
from . import layers

Array = jax.Array


class ClassifierOutput(NamedTuple):
    logits: Array          # [B, C]
    features: Array        # [B, base_dim//2] penultimate features
    anchor_similarities: Array  # [B, C]
    anchor_loss: Array     # scalar
    uncertainty: Array     # [B, 1]


def _xavier_linear(key: Array, in_dim: int, out_dim: int, dtype) -> dict:
    """DeepClassifier applies xavier_uniform + zero bias to every Linear
    (reference classifier.py:136-141)."""
    return {"kernel": layers.xavier_uniform(key, (in_dim, out_dim), dtype),
            "bias": jnp.zeros((out_dim,), dtype)}


def init_classifier(key: Array, input_dim: int, num_labels: int,
                    num_layers: int = 35, base_dim: int = 512,
                    dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12)
    half = base_dim // 2

    # Stacked residual layers: init each layer with its own key, then stack.
    def one_layer(k):
        k1, k2 = jax.random.split(k)
        return {
            "ln_pre": layers.init_layer_norm(base_dim, dtype=dtype),
            "block_ln": layers.init_layer_norm(base_dim, dtype=dtype),
            "block_lin1": _xavier_linear(k1, base_dim, base_dim, dtype),
            "block_lin2": _xavier_linear(k2, base_dim, base_dim, dtype),
        }

    layer_keys = jax.random.split(ks[0], num_layers)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_layer(k) for k in layer_keys])

    return {
        "input_proj": _xavier_linear(ks[1], input_dim, base_dim, dtype),
        "input_ln": layers.init_layer_norm(base_dim, dtype=dtype),
        "layers": stacked,
        "out_proj1": _xavier_linear(ks[2], base_dim, half, dtype),
        "out_ln": layers.init_layer_norm(half, dtype=dtype),
        "out_proj2": _xavier_linear(ks[3], half, num_labels, dtype),
        "anchor": {
            "class_anchors": jax.random.normal(ks[4], (num_labels, 128), dtype),
            "projection": layers.init_linear(ks[5], half, 128, dtype=dtype),
            "proj_ln": layers.init_layer_norm(128, dtype=dtype),
            "temperature": jnp.asarray(1.0, dtype),
        },
        "uncertainty": {
            "lin1": layers.init_linear(ks[6], half, 64, dtype=dtype),
            "lin2": layers.init_linear(ks[7], 64, 1, dtype=dtype),
        },
        "weibull": openmax_ops.init_weibull(num_labels, half, dtype=jnp.float32),
    }


def _residual_stack(stacked: dict, x: Array, *, dropout_rate: float,
                    dropout_key: Optional[Array], deterministic: bool,
                    remat: bool = False) -> Array:
    """Scan over the L stacked residual layers."""

    def body(carry, layer):
        h, key = carry
        if key is not None:
            key, k1, k2, k3 = jax.random.split(key, 4)
        else:
            k1 = k2 = k3 = None
        y = layers.layer_norm(layer["ln_pre"], h)
        b = layers.layer_norm(layer["block_ln"], y)
        b = layers.linear(layer["block_lin1"], b)
        b = jax.nn.relu(b)
        b = layers.dropout(k1, b, dropout_rate, deterministic)
        b = layers.linear(layer["block_lin2"], b)
        b = layers.dropout(k2, b, dropout_rate, deterministic)
        return (y + b, key), None

    if remat:
        body = jax.checkpoint(body)
    (out, _), _ = jax.lax.scan(body, (x, dropout_key), stacked)
    return out


def classifier_features(params: dict, x: Array, *, dropout_rate: float = 0.15,
                        dropout_key: Optional[Array] = None,
                        deterministic: bool = True, remat: bool = False) -> Array:
    """Penultimate [B, base//2] features (reference runtime traversal through
    output_projection[0..3], classifier.py:200-224)."""
    if dropout_key is not None:
        k_in, k_stack, k_out = jax.random.split(dropout_key, 3)
    else:
        k_in = k_stack = k_out = None
    h = layers.linear(params["input_proj"], x)
    h = layers.layer_norm(params["input_ln"], h)
    h = jax.nn.relu(h)
    h = layers.dropout(k_in, h, dropout_rate, deterministic)

    # eval path on TPU: the whole stack fused in one Pallas kernel, the
    # activation resident in VMEM while layer weights stream (HBM traffic =
    # one weight read). Training keeps the scan (dropout RNG per layer).
    from ..ops import pallas_kernels as pk
    if deterministic and pk.use_pallas():
        h = pk.residual_stack_pallas(params["layers"], h)
    else:
        h = _residual_stack(params["layers"], h, dropout_rate=dropout_rate,
                            dropout_key=k_stack, deterministic=deterministic,
                            remat=remat)

    f = layers.linear(params["out_proj1"], h)
    f = layers.layer_norm(params["out_ln"], f)
    f = jax.nn.relu(f)
    f = layers.dropout(k_out, f, dropout_rate, deterministic)
    return f


def anchor_clustering(params: dict, features: Array, *, dropout_rate: float = 0.1,
                      dropout_key: Optional[Array] = None,
                      deterministic: bool = True):
    """ClassAnchorClustering forward (reference classifier.py:32-70)."""
    p = layers.linear(params["projection"], features)
    p = layers.layer_norm(params["proj_ln"], p)
    p = jax.nn.relu(p)
    p = layers.dropout(dropout_key, p, dropout_rate, deterministic)

    eps = 1e-12  # torch F.normalize default
    p_norm = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), eps)
    a = params["class_anchors"]
    a_norm = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)

    sims = (p_norm @ a_norm.T) / params["temperature"]
    # "Pull" loss: clamp(sim - rowmax(sim), min=0) is identically zero; kept
    # for parity with the reference's loss surface (classifier.py:55-70).
    raw = p_norm @ a_norm.T
    pull = jnp.mean(jnp.clip(raw - jnp.max(raw, axis=1, keepdims=True), min=0.0))
    return sims, pull


def classifier_forward(params: dict, x: Array, *, use_openmax: bool = False,
                       dropout_rate: float = 0.15,
                       anchor_dropout: float = 0.1,
                       dropout_key: Optional[Array] = None,
                       deterministic: bool = True,
                       remat: bool = False) -> ClassifierOutput:
    """Full classifier head. `use_openmax` applies the Weibull adjustment
    (inference only, as in reference classifier.py:231-233)."""
    if dropout_key is not None:
        k_feat, k_anchor, k_unc = jax.random.split(dropout_key, 3)
    else:
        k_feat = k_anchor = k_unc = None

    feats = classifier_features(params, x, dropout_rate=dropout_rate,
                                dropout_key=k_feat, deterministic=deterministic,
                                remat=remat)
    sims, anchor_loss = anchor_clustering(params["anchor"], feats,
                                          dropout_rate=anchor_dropout,
                                          dropout_key=k_anchor,
                                          deterministic=deterministic)
    logits = layers.linear(params["out_proj2"], feats)

    u = layers.linear(params["uncertainty"]["lin1"], feats)
    u = jax.nn.relu(u)
    u = layers.dropout(k_unc, u, dropout_rate, deterministic)
    u = jax.nn.sigmoid(layers.linear(params["uncertainty"]["lin2"], u))

    if use_openmax:
        logits = openmax_ops.openmax_adjust(params["weibull"],
                                            feats.astype(jnp.float32),
                                            logits)

    return ClassifierOutput(logits=logits, features=feats,
                            anchor_similarities=sims, anchor_loss=anchor_loss,
                            uncertainty=u)


# ---------------------------------------------------------------------------
# Legacy heads (reference classifier.py:309-436) — the smaller MLP classifiers
# kept by the reference "for backward compatibility". Not on any runtime path
# of the reference's own scripts, provided for API completeness.
# ---------------------------------------------------------------------------

def init_legacy_mlp(key: Array, input_dim: int, num_labels: int,
                    hidden: int = 128, dtype=jnp.float32) -> dict:
    """Linear(in,256)->ReLU->Drop->Linear(256,hidden)->ReLU->Drop->
    Linear(hidden,C) + Weibull buffers (OpenMaxClassifier.__init__,
    classifier.py:309-333; plain Classifier shares the net, :422-436)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin1": layers.init_linear(k1, input_dim, 256, dtype=dtype),
        "lin2": layers.init_linear(k2, 256, hidden, dtype=dtype),
        "lin3": layers.init_linear(k3, hidden, num_labels, dtype=dtype),
        "weibull": openmax_ops.init_weibull(num_labels, hidden,
                                            dtype=jnp.float32),
    }


def legacy_mlp_forward(params: dict, x: Array, *, dropout_rate: float = 0.1,
                       dropout_key: Optional[Array] = None,
                       deterministic: bool = True):
    """Returns (penultimate activations [B, hidden], logits [B, C]) —
    the traversal of OpenMaxClassifier.forward (classifier.py:334-346)."""
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    else:
        k1 = k2 = None
    h = jax.nn.relu(layers.linear(params["lin1"], x))
    h = layers.dropout(k1, h, dropout_rate, deterministic)
    h = jax.nn.relu(layers.linear(params["lin2"], h))
    h = layers.dropout(k2, h, dropout_rate, deterministic)
    return h, layers.linear(params["lin3"], h)


def legacy_classifier_forward(params: dict, x: Array, **kw) -> Array:
    """Plain legacy Classifier (classifier.py:422-436): logits only."""
    return legacy_mlp_forward(params, x, **kw)[1]


def legacy_openmax_forward(params: dict, x: Array, *,
                           use_openmax: bool = True,
                           dropout_rate: float = 0.1,
                           dropout_key: Optional[Array] = None,
                           deterministic: bool = True) -> Array:
    """Legacy OpenMaxClassifier (classifier.py:334-384): at inference,
    scale logits by (1 - unknown_prob) where unknown_prob > 0.5 — note the
    different threshold/scale from the advanced head's 0.3/0.8. The
    reference's per-batch Python loop is a single vectorized where."""
    acts, logits = legacy_mlp_forward(params, x, dropout_rate=dropout_rate,
                                      dropout_key=dropout_key,
                                      deterministic=deterministic)
    if use_openmax and deterministic:
        logits = openmax_ops.openmax_adjust(
            params["weibull"], acts.astype(jnp.float32), logits,
            threshold=0.5, reduction_scale=1.0)
    return logits


def legacy_fit_weibull(features: Array, labels: Array, num_classes: int) -> dict:
    """Legacy parameterization (classifier.py:388-418): alpha=2.0 fixed,
    beta = std(distances), tau = min(distances) — no 1.5x/0.8x scaling."""
    return openmax_ops.fit_weibull(features, labels, num_classes,
                                   alpha=2.0, beta_scale=1.0, tau_scale=1.0)
