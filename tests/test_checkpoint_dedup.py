"""Frozen-subtree checkpoint dedup (train/checkpoint.py)."""

import numpy as np
import jax

from multilingual_multimodal_speech_emotion_recognition_tpu.models import model as mdl
from multilingual_multimodal_speech_emotion_recognition_tpu.train import checkpoint as ckpt

from test_model import tiny_config


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dedup_roundtrip_and_size(tmp_path):
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)

    slim = ckpt.save_checkpoint(tmp_path / "e0", params=params, epoch=0,
                                dedup_frozen=True,
                                frozen_store=tmp_path / "store")
    assert (slim / "frozen_ref.json").exists()
    assert (tmp_path / "store" / "DONE").exists()
    # the per-checkpoint state drops the backbone subtrees entirely
    raw = ckpt._read_state(slim / "state")
    assert "audio_backbone" not in raw["params"]
    assert "text_backbone" not in raw["params"]
    assert "classifier" in raw["params"]

    restored, _, _ = ckpt.restore_checkpoint(slim)
    _assert_tree_equal(restored, params)

    # with a structure template (the loop's resume path)
    restored_t, _, _ = ckpt.restore_checkpoint(slim, params_template=params)
    _assert_tree_equal(restored_t, params)


def test_dedup_store_written_once(tmp_path):
    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(1), cfg)
    ckpt.save_checkpoint(tmp_path / "e0", params=params, epoch=0,
                         dedup_frozen=True, frozen_store=tmp_path / "store")
    mtimes = {f: f.stat().st_mtime_ns
              for f in (tmp_path / "store").rglob("*") if f.is_file()}

    # trainable params change between epochs; frozen store must not rewrite
    params2 = dict(params)
    params2["classifier"] = jax.tree.map(lambda x: x + 1.0,
                                         params["classifier"])
    ckpt.save_checkpoint(tmp_path / "e1", params=params2, epoch=1,
                         dedup_frozen=True, frozen_store=tmp_path / "store")
    for f, t in mtimes.items():
        assert f.stat().st_mtime_ns == t, f

    r1, _, _ = ckpt.restore_checkpoint(tmp_path / "e1")
    _assert_tree_equal(r1, params2)
    r0, _, _ = ckpt.restore_checkpoint(tmp_path / "e0")
    _assert_tree_equal(r0, params)


def test_dedup_store_fingerprint_rejects_different_backbone(tmp_path):
    """Reusing a frozen_store written for DIFFERENT frozen weights must
    raise, not silently merge the stale backbone into new checkpoints."""
    import pytest

    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(2), cfg)
    ckpt.save_checkpoint(tmp_path / "e0", params=params, epoch=0,
                         dedup_frozen=True, frozen_store=tmp_path / "store")

    other = dict(params)
    other["audio_backbone"] = jax.tree.map(lambda x: x + 0.5,
                                           params["audio_backbone"])
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        ckpt.save_checkpoint(tmp_path / "e0_other", params=other, epoch=0,
                             dedup_frozen=True,
                             frozen_store=tmp_path / "store")

    # same weights keep working (fingerprint matches, store reused)
    ckpt.save_checkpoint(tmp_path / "e1", params=params, epoch=1,
                         dedup_frozen=True, frozen_store=tmp_path / "store")

def test_dedup_legacy_done_marker_migrates(tmp_path):
    """Stores written before the fingerprint existed carry a literal "ok"
    DONE marker. Resuming into such a save_dir must verify the stored
    weights by content and migrate the marker — not abort the run."""
    import json

    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(3), cfg)
    ckpt.save_checkpoint(tmp_path / "e0", params=params, epoch=0,
                         dedup_frozen=True, frozen_store=tmp_path / "store")
    done = tmp_path / "store" / "DONE"
    done.write_text("ok")  # simulate the pre-fingerprint marker

    # identical weights: verified by content, marker rewritten, save works
    ckpt.save_checkpoint(tmp_path / "e1", params=params, epoch=1,
                         dedup_frozen=True, frozen_store=tmp_path / "store")
    assert json.loads(done.read_text())["fingerprint"]
    r, _, _ = ckpt.restore_checkpoint(tmp_path / "e1")
    _assert_tree_equal(r, params)

    # legacy marker + actually-different weights must still raise
    done.write_text("ok")
    import pytest
    other = dict(params)
    other["audio_backbone"] = jax.tree.map(lambda x: x + 0.5,
                                           params["audio_backbone"])
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        ckpt.save_checkpoint(tmp_path / "e2", params=other, epoch=2,
                             dedup_frozen=True,
                             frozen_store=tmp_path / "store")


def test_legacy_checkpoint_without_projections_migrates(tmp_path):
    """Checkpoints saved before the learned front-end feature projections
    existed must restore transparently: the missing slots fill with EXACT
    identity projections (function-preserving) and restored optimizer
    moments are dropped so resume warm-starts them."""
    import jax.numpy as jnp
    import optax

    cfg = tiny_config()
    params = mdl.init_model(jax.random.key(0), cfg)
    legacy = {k: v for k, v in params.items()
              if k not in ("asr_proj", "quality_proj", "cond_proj")}
    tx = optax.adam(1e-3)
    legacy_opt = tx.init(legacy)
    path = ckpt.save_checkpoint(tmp_path / "legacy", params=legacy,
                                opt_state=legacy_opt, epoch=3)

    # template-less restore (the eval/infer/export CLI path)
    restored, _, _ = ckpt.restore_checkpoint(path)
    for k in ("asr_proj", "quality_proj", "cond_proj"):
        assert k in restored, k
    # the filled projection is an exact identity through relu
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((5, 8)).astype(np.float32))
    got = mdl._feature_proj(jax.tree.map(jnp.asarray, restored["asr_proj"]),
                            x, dropout_key=None, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)

    # template restore (the train-resume path): params migrate, the stale
    # optimizer state (no moments for the new slots) is dropped
    new_opt = tx.init(params)
    r_params, r_opt, meta = ckpt.restore_checkpoint(
        path, params_template=params, opt_state_template=new_opt)
    assert meta["epoch"] == 3
    assert r_opt is None
    assert set(r_params) == set(params)
    _assert_tree_equal(r_params["classifier"], legacy["classifier"])
