"""Host input pipeline: manifest -> bucketed, padded, fixed-shape batches.

The reference feeds variable-length Python lists through a DataLoader and
pads inside the model per batch (/root/reference/src/train.py:21-24,
audio_encoder.py:147-171) — every batch is a new shape. On TPU that would
recompile constantly, so this pipeline:

  * buckets clips by duration into a small static set of lengths
    (DataConfig.audio_buckets), padding to the bucket size -> the jit cache
    holds at most len(buckets) shapes;
  * tokenizes text to a fixed max length;
  * prefetches and decodes audio on background threads;
  * optionally pads the final partial batch with masked rows
    (`example_mask`) so eval sees every sample exactly once.
"""

from __future__ import annotations

import concurrent.futures as cf
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import DataConfig
from ..frontend import lid as lid_mod
from . import audio_io, bucketing, manifest as manifest_lib
from .tokenizer import Tokenizer, get_tokenizer

# batch keys that stay on host: eval steps also drop labels
TRAIN_HOST_KEYS = ("example_mask", "indices")
EVAL_HOST_KEYS = ("labels", "example_mask", "indices")


@dataclass
class BatchSpec:
    audio_len: int
    batch_size: int
    text_len: int


class SERDataset:
    """Manifest-backed dataset (dataset.py:5-23 semantics)."""

    def __init__(self, manifest_path: str, data_cfg: Optional[DataConfig] = None):
        self.cfg = data_cfg or DataConfig()
        self.items = manifest_lib.read_manifest(manifest_path)

    def __len__(self) -> int:
        return len(self.items)

    def audio_length(self, idx: int) -> int:
        """Duration probe for bucketing. Fast path: WAV header. Non-WAV or
        unreadable files fall back to the actual decoded length via
        load_audio — whose zeros-on-error fallback is exactly what load()
        will later return — so the assigned bucket ALWAYS matches the data
        and a clip can never be silently truncated by a mis-probed bucket."""
        import wave
        from pathlib import Path
        from . import native
        it = self.items[idx]
        p = Path(it["audio"])
        if self.cfg.dataset_root and not p.is_absolute() \
                and not str(p).startswith(self.cfg.dataset_root):
            p = Path(self.cfg.dataset_root) / p
        info = native.wav_info(p) if native.available() else None
        if info is not None:
            n, sr = info
            n = int(n * self.cfg.sample_rate / sr)
            n = min(n, int(self.cfg.sample_rate * self.cfg.max_audio_seconds))
            return max(n, int(self.cfg.sample_rate * self.cfg.min_audio_seconds))
        try:
            with wave.open(str(p), "rb") as w:
                n = w.getnframes()
                sr = w.getframerate()
            n = int(n * self.cfg.sample_rate / sr)
            n = min(n, int(self.cfg.sample_rate * self.cfg.max_audio_seconds))
            n = max(n, int(self.cfg.sample_rate * self.cfg.min_audio_seconds))
            return n
        except Exception:
            wav, _, _ = self.load(idx)
            return len(wav)

    def load(self, idx: int):
        it = self.items[idx]
        audio = audio_io.load_audio(
            it["audio"], sr=self.cfg.sample_rate,
            max_length=self.cfg.max_audio_seconds,
            min_length=self.cfg.min_audio_seconds,
            dataset_root=self.cfg.dataset_root)
        return audio, it.get("text", ""), int(it["label"])


class BucketedLoader:
    """Epoch iterator yielding dicts of fixed-shape numpy arrays."""

    def __init__(self, dataset: SERDataset, *, batch_size: int,
                 tokenizer: Optional[Tokenizer] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_remainder: bool = False,
                 num_workers: int = 8):
        self.ds = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer or get_tokenizer()
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.num_workers = num_workers
        # rows each _assemble call materializes; HostShardedLoader
        # (parallel/multihost.py) narrows this to its per-process slice
        self.batch_rows = batch_size
        cfg = dataset.cfg
        self.bucket_samples = [bucketing.seconds_to_samples(b, cfg.sample_rate)
                               for b in cfg.audio_buckets]
        self._lengths = [dataset.audio_length(i) for i in range(len(dataset))]

    def _bucket_of(self, length: int) -> int:
        for bi, cap in enumerate(self.bucket_samples):
            if length <= cap:
                return bi
        return len(self.bucket_samples) - 1

    def batches_per_epoch(self) -> int:
        counts = {}
        for L in self._lengths:
            b = self._bucket_of(L)
            counts[b] = counts.get(b, 0) + 1
        total = 0
        for c in counts.values():
            total += (c // self.batch_size if self.drop_remainder
                      else -(-c // self.batch_size))
        return total

    def _plan(self, epoch_idx: int) -> List[tuple]:
        """Deterministic epoch plan: [(bucket_idx, [dataset indices])].

        Depends only on (manifest order, seed, epoch_idx), so every process
        of a multi-host job computes the IDENTICAL plan — the property
        HostShardedLoader (parallel/multihost.py) relies on to slice each
        global batch into per-process rows without any coordination."""
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch_idx)
            rng.shuffle(order)

        buckets: Dict[int, List[int]] = {}
        for i in order:
            buckets.setdefault(self._bucket_of(self._lengths[i]), []).append(int(i))

        # interleave batches from all buckets in shuffled order
        batch_plans = []
        for bi, idxs in buckets.items():
            for s in range(0, len(idxs), self.batch_size):
                chunk = idxs[s:s + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_remainder:
                    continue
                batch_plans.append((bi, chunk))
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 7919 + epoch_idx)
            rng.shuffle(batch_plans)
        return batch_plans

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        return self._iter_plans(self._plan(epoch_idx))

    def _iter_plans(self, batch_plans: List[tuple]) -> Iterator[Dict[str, np.ndarray]]:
        from . import native
        use_native = native.available()

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            # two-deep pipelining: next batch's decodes run while the
            # current batch is being consumed on device. With the native
            # decoder the whole batch is one C call (its own thread fan-out,
            # no GIL between files); otherwise one Python decode per file.
            def submit(plan):
                bi, idxs = plan
                if use_native:
                    return [pool.submit(self._load_rows_native, bi, idxs)]
                return [pool.submit(self.ds.load, i) for i in idxs]

            def collect(futs):
                if use_native:
                    return futs[0].result()
                return [f.result() for f in futs]

            pending = None
            for plan in batch_plans:
                nxt = (plan[0], plan[1], submit(plan))
                if pending is not None:
                    bi, idxs, futs = pending
                    yield self._assemble(bi, collect(futs), idxs)
                pending = nxt
            if pending is not None:
                bi, idxs, futs = pending
                yield self._assemble(bi, collect(futs), idxs)

    def _load_rows_native(self, bucket_idx: int, idxs: List[int]) -> list:
        """Decode a whole batch with one native call; rows the C decoder
        can't handle (non-WAV container, resample needed, corrupt file)
        fall back per-row to the Python loader with identical semantics."""
        from . import audio_io, native
        cfg = self.ds.cfg
        T = self.bucket_samples[bucket_idx]
        sr = cfg.sample_rate
        paths = [audio_io.resolve_path(self.ds.items[i]["audio"],
                                       cfg.dataset_root) for i in idxs]
        audio = np.zeros((len(idxs), T), np.float32)
        lens, sts = native.decode_batch(
            [str(p) for p in paths], audio, target_sr=sr,
            min_samples=int(sr * cfg.min_audio_seconds),
            n_threads=self.num_workers)
        out = []
        for r, i in enumerate(idxs):
            it = self.ds.items[i]
            if sts[r] == native.OK:
                wav = audio[r, : int(lens[r])]
            elif sts[r] == native.OPEN_FAILED and not paths[r].exists():
                print(f"Error loading {paths[r]}: file not found")
                wav = np.zeros(sr, np.float32)  # preprocess.py:44-47
            else:
                wav, _, _ = self.ds.load(i)
            out.append((wav, it.get("text", ""), int(it["label"])))
        return out

    def _assemble(self, bucket_idx: int, loaded: list,
                  idxs: Optional[List[int]] = None) -> dict:
        T = self.bucket_samples[bucket_idx]
        if self.ds.cfg.pad_to_batch_max and loaded:
            # reference-faithful eager padding (audio_encoder.py:147-171):
            # pad to the batch's own max clip length, not the bucket cap
            T = min(T, max(len(w) for w, _, _ in loaded))
        B = self.batch_rows

        audio = np.zeros((B, T), np.float32)
        audio_mask = np.zeros((B, T), np.float32)
        labels = np.zeros((B,), np.int32)
        example_mask = np.zeros((B,), np.float32)
        indices = np.full((B,), -1, np.int32)
        texts = [""] * B
        for r, (wav, text, label) in enumerate(loaded):
            L = min(len(wav), T)
            audio[r, :L] = wav[:L]
            audio_mask[r, :L] = 1.0
            labels[r] = label
            texts[r] = text
            example_mask[r] = 1.0
            if idxs is not None and r < len(idxs):
                indices[r] = idxs[r]
        # padded rows must stay valid inputs (fully-masked rows would NaN in
        # masked softmax): give them 1 valid audio sample and BOS/EOS text.
        for r in range(len(loaded), B):
            audio_mask[r, 0] = 1.0

        # host-side language ID scalars feeding the device quality gates
        # (the text side of quality_gates.py:508-515). gates_see_text=False
        # replicates the reference's plain eval loop, where the encoder is
        # called WITHOUT texts (eval.py:192) and every gate takes the
        # no-text fallback (1.0, "unknown", 0.0).
        if self.ds.cfg.gates_see_text:
            ents, _, confs = lid_mod.batch_lid(texts)
        else:
            ents = [1.0] * B
            confs = [0.0] * B
        ids, tmask = self.tokenizer.encode_batch(texts, self.ds.cfg.max_text_tokens)
        batch = {
            "audio": audio, "audio_mask": audio_mask,
            "text_ids": ids, "text_mask": tmask,
            "lid_entropy": np.asarray(ents, np.float32),
            "lid_conf": np.asarray(confs, np.float32),
            "labels": labels, "example_mask": example_mask,
            "indices": indices,
        }
        if self.ds.cfg.emit_asr_feats:
            # host-side ASR features (asr_integration.py:584-600); with
            # manifest text present no transcription backend is invoked
            asr = self._asr()
            feats = np.zeros((B, 8), np.float32)
            for r in range(len(loaded)):
                valid = int(audio_mask[r].sum())
                res = asr.process(audio[r, :valid],
                                  self.ds.cfg.sample_rate,
                                  text=texts[r] or None)
                feats[r] = res.asr_features
            batch["asr_feats"] = feats
        return batch

    def _asr(self):
        if not hasattr(self, "_asr_integration"):
            from ..frontend import asr as asr_mod
            self._asr_integration = asr_mod.EnhancedASRIntegration()
        return self._asr_integration
