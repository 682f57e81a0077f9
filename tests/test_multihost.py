"""Multi-host (pod) layer tests — parallel/multihost.py.

Real multi-process execution needs multiple hosts; what CAN be proven
single-process is the entire row algebra the pod path relies on:

  * the global batch plan is deterministic and identical across simulated
    processes, and their per-process row slices partition it exactly;
  * stacking the per-process loaders' valid rows reproduces the global
    loader's batches row-for-row (audio, text, labels, masks);
  * put_sharded == device_put single-process, and
    make_array_from_process_local_data round-trips on the CPU mesh (the
    exact call the pod path makes);
  * local_rows orders shards by global row offset and dedupes replicas;
  * host_replicated all-gathers a mesh-sharded leaf to a fetchable layout;
  * on a simulated pod, only the coordinator writes checkpoint files.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from multilingual_multimodal_speech_emotion_recognition_tpu.config import DataConfig
import multilingual_multimodal_speech_emotion_recognition_tpu.data.audio_io as aio
import multilingual_multimodal_speech_emotion_recognition_tpu.data.manifest as man
import multilingual_multimodal_speech_emotion_recognition_tpu.data.pipeline as pipe
from multilingual_multimodal_speech_emotion_recognition_tpu.parallel import (
    mesh as mesh_lib, multihost as mh)

RNG = np.random.default_rng(23)


@pytest.fixture()
def dataset(tmp_path):
    root = tmp_path / "datasets" / "crema"
    root.mkdir(parents=True)
    sr = 16000
    emotions = ["ANG", "HAP", "SAD", "NEU", "DIS", "FEA"]
    items = []
    # 10 clips, two buckets (<=2 s and <=4 s), so the plan has a partial
    # final batch in at least one bucket at global batch 4
    for i in range(10):
        L = 12000 if i % 2 else 40000
        x = np.clip(RNG.standard_normal(L) * 0.2, -1, 1).astype(np.float32)
        name = f"10{i:02d}_IEO_{emotions[i % 6]}_XX.wav"
        aio.write_wav(root / name, x, sr)
        items.append({"audio": f"crema/{name}", "text": f"utterance {i}",
                      "label": man.crema_label(name), "dataset": "crema"})
    mpath = tmp_path / "train.jsonl"
    man.write_manifest(mpath, items)
    cfg = DataConfig(dataset_root=str(tmp_path / "datasets"))
    return pipe.SERDataset(str(mpath), cfg)


def _loaders(dataset, pc):
    g = pipe.BucketedLoader(dataset, batch_size=4, shuffle=True, seed=3)
    shards = [mh.HostShardedLoader(dataset, batch_size=4, shuffle=True,
                                   seed=3, process_index=p, process_count=pc)
              for p in range(pc)]
    return g, shards


def test_sharded_plans_partition_the_global_plan(dataset):
    g, (s0, s1) = _loaders(dataset, 2)
    gp, p0, p1 = g._plan(5), s0._plan(5), s1._plan(5)
    assert len(gp) == len(p0) == len(p1)
    assert g.batches_per_epoch() == s0.batches_per_epoch()
    for (gb, gc), (b0, c0), (b1, c1) in zip(gp, p0, p1):
        assert gb == b0 == b1
        assert c0 == gc[:2] and c1 == gc[2:4]   # contiguous row blocks
        assert c0 + c1 == gc                    # exact partition, in order


def test_stacked_local_rows_reproduce_global_batches(dataset):
    g, (s0, s1) = _loaders(dataset, 2)
    for bg, b0, b1 in zip(g.epoch(1), s0.epoch(1), s1.epoch(1)):
        assert b0["audio"].shape[0] == 2 and bg["audio"].shape[0] == 4
        vg = bg["example_mask"] > 0
        for key in ("audio", "audio_mask", "text_ids", "text_mask",
                    "labels", "lid_entropy", "lid_conf", "indices"):
            stacked = np.concatenate([b0[key][b0["example_mask"] > 0],
                                      b1[key][b1["example_mask"] > 0]])
            np.testing.assert_array_equal(stacked, bg[key][vg], err_msg=key)


def test_global_batch_not_divisible_by_processes_raises(dataset):
    with pytest.raises(ValueError):
        mh.HostShardedLoader(dataset, batch_size=5,
                             process_index=0, process_count=2)


def test_put_sharded_matches_device_put_and_local_data_path():
    mesh = mesh_lib.make_mesh()
    s = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    x = RNG.standard_normal((16, 3)).astype(np.float32)
    a = mh.put_sharded(x, s)                      # single-process fast path
    np.testing.assert_array_equal(np.asarray(a), x)
    assert a.sharding.is_equivalent_to(s, 2)
    # the pod branch's actual call, valid single-process too: local rows
    # cover all addressable shards
    b = jax.make_array_from_process_local_data(s, x)
    np.testing.assert_array_equal(np.asarray(b), x)
    assert b.sharding.is_equivalent_to(s, 2)


class _FakeShard:
    def __init__(self, start, rows, width=3):
        self.index = (slice(start, start + rows.shape[0]),
                      slice(None))
        self.data = rows


class _FakeGlobalArray:
    """Stands in for a non-fully-addressable pod array: shards arrive
    unordered and with a tensor-parallel replica of one row block."""
    is_fully_addressable = False
    is_fully_replicated = False

    def __init__(self, shards, shape=(4, 3)):
        self.addressable_shards = shards
        self.shape = shape
        self.ndim = len(shape)


def test_local_rows_orders_and_dedupes_shards():
    r0 = RNG.standard_normal((2, 3)).astype(np.float32)
    r1 = RNG.standard_normal((2, 3)).astype(np.float32)
    fake = _FakeGlobalArray([
        _FakeShard(2, r1),
        _FakeShard(0, r0),
        _FakeShard(2, r1.copy()),   # model-axis replica: same rows again
    ])
    out = mh.local_rows(fake)
    np.testing.assert_array_equal(out, np.concatenate([r0, r1]))


class _ColShard:
    def __init__(self, row_start, rows, col_lo, col_hi, data):
        self.index = (slice(row_start, row_start + rows),
                      slice(col_lo, col_hi))
        self.data = data


class _ColArray(_FakeGlobalArray):
    pass


def test_local_rows_reassembles_column_sharded_leaves():
    # tensor-parallel feats [4, 6] sharded 2-way on 'model': this process
    # addresses both column halves of both row blocks -> full reassembly
    full = RNG.standard_normal((4, 6)).astype(np.float32)
    shards = [
        _ColShard(0, 2, 0, 3, full[0:2, 0:3]),
        _ColShard(0, 2, 3, 6, full[0:2, 3:6]),
        _ColShard(2, 2, 3, 6, full[2:4, 3:6]),
        _ColShard(2, 2, 0, 3, full[2:4, 0:3]),
    ]
    out = mh.local_rows(_ColArray(shards, (4, 6)))
    np.testing.assert_array_equal(out, full)


def test_local_rows_raises_on_truncated_column_coverage():
    # only one column half addressable -> must raise, never silently
    # return truncated rows (advisor round-3 finding)
    full = RNG.standard_normal((2, 6)).astype(np.float32)
    shards = [_ColShard(0, 2, 0, 3, full[:, 0:3])]
    with pytest.raises(ValueError, match="non-batch axis"):
        mh.local_rows(_ColArray(shards, (2, 6)))


def test_initialize_reraises_runtime_failure_when_explicit(monkeypatch):
    # explicit coordinator flags + a non-"already initialized" RuntimeError
    # (e.g. XlaRuntimeError: coordinator unreachable) must raise, not
    # silently demote the process to a self-elected single-host coordinator
    def boom(**kw):
        raise RuntimeError("DEADLINE_EXCEEDED: coordinator unreachable")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="unreachable"):
        mh.initialize(coordinator_address="10.0.0.1:8476",
                      num_processes=2, process_id=1)


def test_initialize_swallows_double_init(monkeypatch):
    def already(**kw):
        raise RuntimeError("Distributed initialization can only be called once")
    monkeypatch.setattr(jax.distributed, "initialize", already)
    # idempotent re-entry (two-phase training) stays quiet; single process
    assert mh.initialize(coordinator_address="10.0.0.1:8476",
                         num_processes=1, process_id=0) is False


def test_any_process_identity_single_process():
    assert mh.any_process(True) is True
    assert mh.any_process(False) is False


def test_local_rows_and_allgather_identity_single_process():
    x = RNG.standard_normal((8, 2)).astype(np.float32)
    mesh = mesh_lib.make_mesh()
    a = jax.device_put(x, NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    np.testing.assert_array_equal(mh.local_rows(a), x)
    np.testing.assert_array_equal(mh.allgather_rows(x), x)


def test_host_replicated_gathers_sharded_leaves(monkeypatch):
    mesh = mesh_lib.make_mesh()
    x = jax.device_put(np.arange(64, dtype=np.float32).reshape(8, 8),
                       NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    monkeypatch.setattr(jax, "process_count", lambda: 2)  # simulate a pod
    out = mh.host_replicated({"w": x, "step": 3})
    assert out["w"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(x))
    assert out["step"] == 3


def test_pod_checkpoint_only_coordinator_writes(monkeypatch, tmp_path):
    from multilingual_multimodal_speech_emotion_recognition_tpu.train import (
        checkpoint as ck)
    params = {"head": {"kernel": np.ones((4, 2), np.float32)}}
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    p = ck.save_checkpoint(tmp_path / "ck", params=params, step=7)
    assert not (tmp_path / "ck" / "meta.json").exists()  # non-coordinator
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ck.save_checkpoint(tmp_path / "ck", params=params, step=7)
    assert (tmp_path / "ck" / "meta.json").exists()
    restored, _, meta = ck.restore_checkpoint(p, params_template=params)
    np.testing.assert_array_equal(np.asarray(restored["head"]["kernel"]),
                                  params["head"]["kernel"])
    assert meta["step"] == 7


def test_initialize_is_a_noop_without_hints(monkeypatch):
    for k in mh._POD_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    # single-hostname TPU_WORKER_HOSTNAMES (single-host VMs, relayed dev
    # boxes) must NOT count as a pod hint
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert mh.initialize() is False


def test_initialize_degrades_when_autodetect_fails(monkeypatch):
    for k in mh._POD_ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")  # pod-like
    # auto-detect can't resolve a coordinator here; hinted (non-explicit)
    # failure must fall back to single-process, not raise (the exact error
    # surfaced — ValueError vs RuntimeError — depends on whether the
    # backend already initialized, so only the contract is asserted)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert mh.initialize() is False
